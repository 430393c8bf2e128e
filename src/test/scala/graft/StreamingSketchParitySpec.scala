package graft

import graft.streaming.EventAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream/batch parity for the bounded-sketch aggregate
  * (EventAnalytics.heavyHitters): the documents corpus tokenized and
  * fed as a STREAM in round-robin micro-batches, the SpaceSaving
  * buffer carried as streaming aggregation state across batches — the
  * final complete-mode emission must equal the batch
  * text_heavy_hitters DECLARED QUERY row for row (the
  * StreamingMinhashParitySpec pattern: an operator's ingest-time face
  * proves itself against its batch face on identical input — here
  * that batch face is itself oracle-checked, closing the chain
  * stream == batch == DuckDB). EventAnalyticsSpec covers the small
  * synthetic-feed behavior; this rides the real corpus. */
class StreamingSketchParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming SpaceSaving state across batches == batch heavy hitters") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    assert(docs.size >= 10, s"corpus too small: ${docs.size}")

    val in = MemoryStream[(Long, String)]
    val tokens = in.toDF().toDF("doc_id", "text")
      .select(explode(expr(
        "filter(split(text, '\\\\s+'), t -> t != '')")).as("t"))
    val q = EventAnalytics.heavyHitters(tokens, tokenCol = "t")
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode(OutputMode.Complete).start()
    docs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .foreach { case (_, b) =>
        in.addData(b.map(_._1)); q.processAllAvailable()
      }
    val streamed = spark.table("hh_stream")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    q.stop()

    val batch = SparkEntry.queries("text_heavy_hitters")(spark, sf)
      .as[(Long, String, Long, Long)].collect().sorted.toSeq

    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streaming sketch ${streamed} != batch ${batch}")
    // the exact-below-capacity contract the parity rides: no eviction
    // error on this corpus's bounded vocabulary
    assert(batch.forall(_._4 == 0L), "expected err 0 below capacity")
  }
}
