package graft

import graft.streaming.IngestPipeline
import graft.streaming.IngestPipeline.{RawDoc, Verdict}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The composed streaming ingest stage: quality gate + cross-batch
  * exact-dup gate + shard assignment in ONE keyed pass. */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val long1 =
    "a sufficiently long document with more than ten whitespace " +
      "separated tokens for the quality gate to accept it"
  private val long2 =
    "another acceptable document whose token count comfortably " +
      "clears the minimum quality threshold of the ingest gate"

  test("one pass: quality reject, cross-batch dup reject, shard accept") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[RawDoc]
    val q = IngestPipeline.decisions(in.toDS())
      .writeStream.format("memory").queryName("ingest")
      .outputMode(OutputMode.Append).start()
    // batch 1: 5 and 7 share content (5 wins by min id), 3 is too short
    in.addData(RawDoc(5, long1, "crawl"), RawDoc(7, long1, "crawl"),
      RawDoc(3, "too short", "crawl"))
    q.processAllAvailable()
    // batch 2: 9 duplicates batch-1 content (state must remember),
    // 11 is fresh and accepted
    in.addData(RawDoc(9, long1, "crawl"), RawDoc(11, long2, "web"))
    q.processAllAvailable()
    // batch 3: a LOWER id re-delivers accepted content — still a
    // duplicate (doc 5 is already in the corpus store)
    in.addData(RawDoc(4, long1, "crawl"))
    q.processAllAvailable()
    val got = spark.table("ingest").as[Verdict].collect()
      .map(v => v.doc_id -> v).toMap
    q.stop()
    assert(got(5L).verdict == "accept" && got(5L).first_id == 5L)
    assert(got(7L).verdict == "reject_duplicate" && got(7L).first_id == 5L)
    assert(got(3L).verdict == "reject_quality" && got(3L).shard == -1)
    assert(got(9L).verdict == "reject_duplicate" && got(9L).first_id == 5L,
      "cross-batch duplicate must resolve to the original")
    assert(got(4L).verdict == "reject_duplicate" && got(4L).first_id == 5L,
      "a lower-id late duplicate must not be re-accepted")
    assert(got(11L).verdict == "accept")
    // accepted docs get a real shard matching the batch shard expression
    assert(got(5L).shard == IngestPipeline.shardOf(5L, 32))
    assert(got(11L).shard >= 0 && got(11L).shard < 32)
  }

  test("contamination gate: bloom-flagged docs reject first, clean docs flow") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // benchmark = one eval doc; a contaminated crawl doc embeds a long
    // verbatim span of it, a clean doc shares nothing
    val benchText = "the quick brown fox jumps over the lazy dog while " +
      "seventeen judges of unusual quality evaluate every held out answer"
    val contaminated = "scraped page preamble " + benchText +
      " trailing navigation chrome and footer links"
    val gate = IngestPipeline.ContaminationGate.fromBenchmark(
      Seq(benchText).toDF("text"), threshold = 24)
    // sanity on the kernel itself: the embedded span shares nearly all
    // benchmark shingles; the clean doc a handful at most (FPs)
    assert(IngestPipeline.ContaminationGate.hits(gate, contaminated) >= 24)
    assert(IngestPipeline.ContaminationGate.hits(gate, long2) < 24)
    val in = MemoryStream[RawDoc]
    val q = IngestPipeline.decisions(in.toDS(), gate = Some(gate))
      .writeStream.format("memory").queryName("ingest_c")
      .outputMode(OutputMode.Append).start()
    in.addData(RawDoc(1, contaminated, "crawl"), RawDoc(2, long2, "web"),
      RawDoc(3, "short but also " + benchText, "crawl"))
    q.processAllAvailable()
    // a later CLEAN duplicate of nothing must still be accepted: the
    // contaminated reject must not have claimed dedup state
    in.addData(RawDoc(4, contaminated + " x", "crawl"))
    q.processAllAvailable()
    val got = spark.table("ingest_c").as[Verdict].collect()
      .map(v => v.doc_id -> v).toMap
    q.stop()
    assert(got(1L).verdict == "reject_contaminated" && got(1L).shard == -1)
    assert(got(2L).verdict == "accept")
    assert(got(3L).verdict == "reject_contaminated",
      "contamination must outrank the quality gate")
    assert(got(4L).verdict == "reject_contaminated",
      "near-identical contaminated content must also be flagged")
  }

  test("quality threshold is honored and rejects carry their token count") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[RawDoc]
    // long1 has 18 tokens: accepted at the default threshold (10),
    // rejected at 25 — the knob must actually gate
    val q = IngestPipeline.decisions(in.toDS(), minTokens = 25)
      .writeStream.format("memory").queryName("ingest_q")
      .outputMode(OutputMode.Append).start()
    in.addData(RawDoc(1, long1, "a"))
    q.processAllAvailable()
    val got = spark.table("ingest_q").as[Verdict].collect()
    q.stop()
    assert(got.length == 1)
    assert(got.head.verdict == "reject_quality")
    assert(got.head.n_tokens == long1.split("\\s+").count(_.nonEmpty))
  }

  test("streaming split assignment == batch corpus_split on the same feed") {
    // the ingest-time face of the batch release gate: same content
    // hash, so the split is decided once at ingest and the batch gate
    // later agrees row for row (the StreamingMinhashParitySpec pattern)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(docs.size >= 10, s"corpus too small: ${docs.size}")
    val in = MemoryStream[RawDoc]
    val q = IngestPipeline.assignSplits(in.toDS())
      .writeStream.format("memory").queryName("ingest_split")
      .outputMode(OutputMode.Append).start()
    // three micro-batches, round-robin: batch boundaries must not
    // matter for a stateless content-hash map
    docs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .foreach { case (_, b) =>
        in.addData(b.map { case ((id, t, src), _) => RawDoc(id, t, src) })
        q.processAllAvailable()
      }
    val streamed = spark.table("ingest_split")
      .as[IngestPipeline.SplitAssign].collect()
      .map(s => (s.doc_id, s.source, s.bucket, s.split)).sorted.toSeq
    q.stop()
    val batch = SparkEntry.queries("corpus_split")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    assert(streamed.size == docs.size && batch.size == docs.size)
    assert(streamed == batch,
      "ingest-time split must equal the batch corpus_split gate")
    // the 90/5/5 contract actually stratifies on this corpus
    val bySplit = streamed.groupBy(_._4).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), s"got $bySplit")
  }
}
