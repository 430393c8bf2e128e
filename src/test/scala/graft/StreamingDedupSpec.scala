package graft

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{Candidate, Doc, GateResult}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Cross-batch streaming dedup: the keyed state must recognize content
  * ingested in EARLIER micro-batches — the property neither a
  * within-batch dedup nor a watermarked dropDuplicates provides. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while seventeen " +
      "auditors examine wire formats and replication slots before " +
      "breakfast because deterministic pipelines demand evidence " +
      "of every byte moved across the network in commit order"

  test("exact gate: first wins across micro-batch boundaries") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingDedup.exactGate(in.toDS())
      .writeStream.format("memory").queryName("exact_gate")
      .outputMode(OutputMode.Append).start()
    // batch 1: three distinct docs
    in.addData(Doc(1, base), Doc(2, base + " two"), Doc(3, base + " three"))
    q.processAllAvailable()
    // batch 2: doc 11 duplicates doc 1's content, doc 13 is fresh
    in.addData(Doc(11, base), Doc(13, base + " thirteen"))
    q.processAllAvailable()
    // batch 3: a LOWER id re-delivers admitted content — still a
    // duplicate (the stored first wins unconditionally; re-flagging it
    // as first would admit the same content twice downstream)
    in.addData(Doc(0, base))
    q.processAllAvailable()
    val got = spark.table("exact_gate").as[GateResult].collect()
      .map(r => r.doc_id -> ((r.first_id, r.is_first))).toMap
    q.stop()
    assert(got(1L) == ((1L, true)) && got(2L) == ((2L, true)) &&
      got(3L) == ((3L, true)))
    assert(got(11L) == ((1L, false)),
      "a later batch's duplicate must resolve to the original")
    assert(got(13L) == ((13L, true)))
    assert(got(0L) == ((1L, false)),
      "a lower-id late duplicate must NOT re-claim first-wins state")
  }

  test("exact gate state survives a query restart (checkpoint recovery)") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dedup-ckpt").toString
    val results =
      new java.util.concurrent.CopyOnWriteArrayList[GateResult]()
    def run(in: MemoryStream[Doc])(feed: => Unit): Unit = {
      val q = StreamingDedup.exactGate(in.toDS())
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[GateResult], _: Long) =>
            b.collect().foreach(results.add)
            ()
        }
        .start()
      feed
      q.processAllAvailable()
      q.stop()
    }
    // same source instance, but a NEW query execution per run against
    // the same checkpoint: batch 2 runs under a restarted query whose
    // keyed state must come back from the state store (committed
    // offsets mean batch 1 is NOT replayed — dedup of doc 31 can only
    // succeed via recovered state)
    val in = MemoryStream[Doc]
    run(in) { in.addData(Doc(1, base), Doc(2, base + " two")) }
    run(in) { in.addData(Doc(31, base), Doc(32, base + " fresh")) }
    import scala.jdk.CollectionConverters._
    val got = results.iterator().asScala
      .map(r => r.doc_id -> ((r.first_id, r.is_first))).toMap
    assert(got(31L) == ((1L, false)),
      s"restarted query forgot pre-restart content: $got")
    assert(got(32L) == ((32L, true)))
  }

  test("near-dup candidates: band state flags edited re-ingests") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamingDedup.nearDupCandidates(in.toDF())
      .writeStream.format("memory").queryName("near_gate")
      .outputMode(OutputMode.Append).start()
    in.addData(Doc(1, base), Doc(2, "entirely different text about " +
      "orbital mechanics and the restricted three body problem with " +
      "lagrange points libration and halo orbits near translunar space"))
    q.processAllAvailable()
    // doc 21: doc 1's text with one word edited (high jaccard) --
    // must collide with doc 1 in at least one band; doc 22: unrelated
    in.addData(Doc(21, base.replace("auditors", "referees")),
      Doc(22, "completely unrelated content on fermentation chemistry " +
        "yeast metabolism lactic acid bacteria and the maillard " +
        "reaction in long fermented sourdough baking processes"))
    q.processAllAvailable()
    // batch 3: a LOWER id near-duplicate of doc 1 — the old `first <
    // id` guard silently dropped this candidate
    in.addData(Doc(0, base.replace("breakfast", "brunch")))
    q.processAllAvailable()
    val pairs = spark.table("near_gate").as[Candidate].collect()
      .map(c => (c.doc_id, c.first_id)).distinct.toSet
    q.stop()
    assert(pairs.contains((21L, 1L)),
      s"edited re-ingest not flagged against the original: $pairs")
    assert(pairs.contains((0L, 1L)),
      s"lower-id near-dup arriving later must still pair: $pairs")
    assert(!pairs.exists(_._1 == 22L),
      s"unrelated doc falsely flagged: $pairs")
    assert(!pairs.exists(_._1 == 2L), s"batch-1 distinct docs collided: $pairs")
  }
}
