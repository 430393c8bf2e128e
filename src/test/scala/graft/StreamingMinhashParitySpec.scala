package graft

import graft.operators.Dedup
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Pair
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stream/batch parity for the flagship near-dup operator: the
  * documents corpus ingested as a STREAM in round-robin micro-batches
  * (so true pairs straddle batch boundaries), candidates from the
  * cross-batch keyed band-bucket state, verified through the SAME
  * exact-Jaccard kernel the batch LSH uses — output must equal
  * dedup_minhash_lsh row for row. Same pattern as Scd2ParitySpec: the
  * ingest-time face of an operator proves itself against its batch
  * face on identical input. */
class StreamingMinhashParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming minhash pairs + shared verify == batch dedup_minhash_lsh") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    assert(docs.size >= 10, s"corpus too small: ${docs.size}")

    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup
      .nearDupPairs(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("mh_pairs")
      .outputMode(OutputMode.Append).start()
    // round-robin split: consecutive doc_ids (where the synthetic
    // corpus plants its near-dups) land in DIFFERENT micro-batches
    val batches = docs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
    batches.foreach { case (_, b) =>
      in.addData(b.map(_._1)); q.processAllAvailable()
    }
    val streamCands = spark.table("mh_pairs").as[Pair].collect()
      .map(p => (p.a_id, p.b_id)).distinct.toSeq
    q.stop()

    val verified = Dedup.verifyJaccard(
      streamCands.toDF("a_id", "b_id"),
      Dedup.shingleSets(Tables.documents(spark, sf)), 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted

    val batch = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted

    assert(batch.nonEmpty, "corpus must contain verified near-dup pairs" +
      " for the parity to be meaningful")
    assert(verified.toSeq == batch.toSeq,
      s"stream pairs ${verified.toSeq} != batch pairs ${batch.toSeq}")
  }

  test("streaming simhash (in-state verify) == batch dedup_simhash") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamingDedup.SimPair
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    // wide = the Manku scale layout — parity must hold for the banding
    // actually deployed at scale, not just the 4x15 test default
    val q = StreamingDedup
      .simhashNearDups(in.toDF().toDF("doc_id", "text"), wide = true)
      .writeStream.format("memory").queryName("sh_pairs")
      .outputMode(OutputMode.Append).start()
    val batches = docs.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
    batches.foreach { case (_, b) =>
      in.addData(b.map(_._1)); q.processAllAvailable()
    }
    val stream = spark.table("sh_pairs").as[SimPair].collect()
      .map(p => (p.a_id, p.b_id, p.hamming)).distinct.sorted.toSeq
    q.stop()
    val batch = SparkEntry.queries("dedup_simhash")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue())) // bit_count yields int
      .sorted.toSeq
    assert(batch.nonEmpty, "corpus must contain simhash near-dups")
    assert(stream == batch, s"stream $stream != batch $batch")
  }

  test("all-pairs roster emits within-bucket pairs beyond the first doc") {
    // three mutual near-dups arriving in three different batches: the
    // representative-only candidate stream pairs (2,1),(3,1); the
    // all-pairs roster must also surface (2,3)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen auditors examine wire formats and replication slots " +
      "before breakfast because deterministic pipelines demand " +
      "evidence of every byte moved across the network in commit order"
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupPairs(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("mh_roster")
      .outputMode(OutputMode.Append).start()
    in.addData((1L, base)); q.processAllAvailable()
    in.addData((2L, base.replace("auditors", "referees")))
    q.processAllAvailable()
    in.addData((3L, base.replace("breakfast", "brunch")))
    q.processAllAvailable()
    val pairs = spark.table("mh_roster").as[Pair].collect()
      .map(p => (p.a_id, p.b_id)).distinct.toSet
    q.stop()
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected the full clique, got $pairs")
  }
}
