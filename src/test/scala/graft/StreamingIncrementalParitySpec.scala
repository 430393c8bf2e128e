package graft

import graft.operators.Dedup
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Pair
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream/batch parity for the INCREMENTAL dedup ingest gate: the
  * standing index (doc_id % 10 != 9) arrives first as two
  * micro-batches, the incoming batch (doc_id % 10 == 9) arrives last;
  * candidates come from the cross-batch word-gram band-bucket state
  * ([[StreamingDedup.nearDupPairsWords]] — the SAME
  * wordGramSetsPlan/MinHashSig/bandStructs lineage the batch gate
  * bands), are verified through the SAME exact-Jaccard kernel, and the
  * resulting per-doc admit decisions must equal `dedup_incremental`
  * row for row. This is the production shape at 100 TB: index banded
  * once and held as state, each arrival probing buckets — never
  * rescanning the corpus. */
class StreamingIncrementalParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming word-gram gate == batch dedup_incremental decisions") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    val (batchDocs, indexDocs) = docs.partition(_._1 % 10 == 9)
    assert(batchDocs.nonEmpty && indexDocs.nonEmpty)

    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup
      .nearDupPairsWords(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("inc_pairs")
      .outputMode(OutputMode.Append).start()
    // index first (two micro-batches, so index state itself is
    // cross-batch), then the incoming batch
    indexDocs.grouped(math.max(1, (indexDocs.size + 1) / 2))
      .foreach { b => in.addData(b); q.processAllAvailable() }
    in.addData(batchDocs); q.processAllAvailable()
    val cands = spark.table("inc_pairs").as[Pair].collect()
      .map(p => (p.a_id, p.b_id)).distinct.toSeq
    q.stop()

    // the gate consumes only asymmetric (batch, index) candidates —
    // index-index pairs the roster also surfaced are not its business
    val probes = cands.flatMap { case (x, y) =>
      (x % 10 == 9, y % 10 == 9) match {
        case (true, false) => Some((x, y))
        case (false, true) => Some((y, x))
        case _ => None
      }
    }.distinct
    val verified = Dedup.verifyJaccard(probes.toDF("a_id", "b_id"),
      Dedup.wordGramSets(Tables.documents(spark, sf)), 0.9)
    val per = verified.groupBy(col("a_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("b_id")).as("first_index_id"),
        max(expr("inter * 1000000L div union_n")).as("best_jac_ppm"))
    def row5(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))
    val stream = batchDocs.map(_._1).toDF("batch_id")
      .join(per, col("batch_id") === col("a_id"), "left")
      .select(col("batch_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("first_index_id"), col("best_jac_ppm"),
        (coalesce(col("n_matches"), lit(0L)) === 0).as("admit"))
      .collect().map(row5).sorted.toSeq
    val batch = SparkEntry.queries("dedup_incremental")(spark, sf)
      .collect().map(row5).sorted.toSeq
    assert(batch.exists(!_._5),
      "corpus must produce at least one rejected (non-admitted) doc" +
        " for the parity to be meaningful")
    assert(stream == batch, s"stream $stream != batch $batch")
  }
}
