package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stream/batch parity for scene-cut segmentation: a clip arrives as
  * ONE row, so the ingest face (Multimodal.sceneCutReport) is a pure
  * stateless expression over the FrameSums array — no window, no
  * shuffle, Append mode. It must emit exactly the rows the batch
  * query's window/aggregate formulation (mm_scene_cuts) computes at
  * rest. This pins the expression-vs-window equivalence: a threshold
  * or framing change that lands on only one face breaks the spec. */
class StreamingSceneCutParitySpec extends SparkSpec {
  import spark.implicits._

  test("stateless streaming scene-cut report == batch mm_scene_cuts") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)

    val in = MemoryStream[(Long, String)]
    val q = graft.operators.Multimodal
      .sceneCutReport(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("scenes_stream")
      .outputMode(OutputMode.Append).start()
    docs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .foreach { case (_, b) =>
        in.addData(b.map(_._1)); q.processAllAvailable()
      }
    val streamed = spark.table("scenes_stream")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    q.stop()

    val batch = SparkEntry.queries("mm_scene_cuts")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream scene report != batch (${streamed.size} vs ${batch.size})")
  }

  test("the stateless report detects cuts (synthetic step clip)") {
    // the sf0.001 corpus has no energy step past the threshold, so the
    // cut path is pinned on a hand-computed clip: 'a'(97)x64 then
    // '!'(33)x64 — |Δsum| = 64*64 = 4096 > 1024 → one cut, two
    // 1-frame segments; plus a uniform clip (no cut) and a 3-frame
    // clip with a step after frame 2 (longest segment = 2)
    val rows = graft.operators.Multimodal.sceneCutReport(Seq(
      (1L, "a" * 64 + "!" * 64),
      (2L, "a" * 128),
      (3L, "a" * 128 + "!" * 64)
    ).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(rows == Seq((1L, 2L, 1L, 1L), (2L, 2L, 0L, 2L),
      (3L, 3L, 1L, 2L)), s"got $rows")
  }
}
