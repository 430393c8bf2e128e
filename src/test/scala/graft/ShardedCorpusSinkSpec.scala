package graft

import graft.streaming.{IngestPipeline, ShardedCorpusSink}
import graft.streaming.IngestPipeline.RawDoc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class ShardedCorpusSinkSpec extends SparkSpec {
  import spark.implicits._

  private val long1 =
    "a sufficiently long document with more than ten whitespace " +
      "separated tokens for the quality gate to accept it"

  test("replayed batch ids are skipped — no duplicate rows on recovery") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-corpus").toString
    val sink = new ShardedCorpusSink(out, nShards = 8)
    val docs = Seq((1L, "alpha " + long1), (2L, "beta " + long1))
      .toDF("doc_id", "text")
    assert(sink.writeEpoch(docs, 0L), "first attempt must write")
    // failure-replay: same batchId arrives again (foreachBatch contract)
    assert(!sink.writeEpoch(docs, 0L), "replay must be skipped")
    assert(sink.writeEpoch(docs.withColumn("doc_id",
      $"doc_id" + 10), 1L))
    val back = sink.readCommitted(spark)
    assert(back.count() == 4, "replay duplicated rows")
    // layout: rows are physically partitioned by the shared shard expr
    assert(back.columns.contains("shard"))
    // the partition column comes back int-typed from directory names
    val shards = back.selectExpr("doc_id", "cast(shard as long) shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    shards.foreach { case (id, s) =>
      assert(s == IngestPipeline.shardOf(id, 8).toLong, s"doc $id layout")
    }
  }

  test("an all-rejected stream reads back as an empty corpus, not a crash") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-corpus-empty").toString
    val sink = new ShardedCorpusSink(out, nShards = 8)
    // every epoch commits empty (upstream rejected everything): a
    // legitimate stream state — there is no parquet footer anywhere to
    // infer schema from, so the reader honors the declared one
    assert(sink.writeEpoch(Seq.empty[(Long, String)]
      .toDF("doc_id", "text"), 0L))
    assert(sink.writeEpoch(Seq.empty[(Long, String)]
      .toDF("doc_id", "text"), 1L))
    assert(sink.committedEpochs() == Set(0L, 1L))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val back = sink.readCommitted(spark, schema)
    assert(back.count() == 0)
    assert(back.schema == schema)
    // and with no declared schema: empty, zero columns, still no crash
    assert(sink.readCommitted(spark).count() == 0)
  }

  test("a declared schema yields the same shape whether or not epochs have data") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-corpus-shape").toString
    val sink = new ShardedCorpusSink(out, nShards = 8)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // all-rejected state: declared shape
    assert(sink.writeEpoch(Seq.empty[(Long, String)]
      .toDF("doc_id", "text"), 0L))
    val emptyShape = sink.readCommitted(spark, schema).schema
    // then data arrives: the declared shape must NOT change (the
    // non-empty path used to add the discovered shard column)
    assert(sink.writeEpoch(Seq((1L, "alpha " + long1))
      .toDF("doc_id", "text"), 1L))
    val back = sink.readCommitted(spark, schema)
    assert(back.schema == emptyShape,
      s"reader shape changed with state: ${back.schema} vs $emptyShape")
    assert(back.count() == 1)
    // a declared column the store doesn't have fails loudly instead of
    // being silently ignored
    val badSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("nope",
        org.apache.spark.sql.types.LongType)))
    val e = intercept[IllegalArgumentException] {
      sink.readCommitted(spark, badSchema)
    }
    assert(e.getMessage.contains("nope"))
    // no declared schema: inferred columns incl. the shard layout
    assert(sink.readCommitted(spark).columns.contains("shard"))
  }

  test("out-of-range shard values fail loudly instead of polluting layout") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-corpus-bad").toString
    val sink = new ShardedCorpusSink(out, nShards = 8)
    // a reject row's shard = -1 (caller forgot the accept filter), and
    // a shard from a mismatched modulus (17 >= 8)
    val bad = Seq((1L, -1L), (2L, 17L)).toDF("doc_id", "shard")
    val e = intercept[Exception] { sink.writeEpoch(bad, 0L) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("shard out of range")),
      s"unexpected error: $e")
    assert(sink.committedEpochs().isEmpty, "failed epoch must not commit")
  }

  test("end-to-end: ingest decisions stream into the sharded store once") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files
      .createTempDirectory("graft-corpus-e2e").toString
    val sink = new ShardedCorpusSink(out, nShards = 8)
    val in = MemoryStream[RawDoc]
    // pipeline and sink must agree on the shard modulus: the sink
    // validates incoming shard values against its own layout
    val q = IngestPipeline.decisions(in.toDS(), nShards = 8)
      .filter(_.verdict == "accept")
      .toDF()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.writeEpoch(b, id); ()
      }
      .start()
    in.addData(RawDoc(1, "alpha " + long1, "crawl"),
      RawDoc(2, "alpha " + long1, "crawl"), // duplicate content
      RawDoc(3, "tiny", "crawl")) // quality reject
    q.processAllAvailable()
    in.addData(RawDoc(9, "gamma " + long1, "web"))
    q.processAllAvailable()
    q.stop()
    val back = sink.readCommitted(spark)
    // only the accepted survivors landed: 1 (first of dup pair) and 9
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 9L))
  }
}
