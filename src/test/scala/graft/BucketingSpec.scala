package graft

import org.apache.spark.sql.functions._

/** Bucketing is the 100 TB repeated-join tool: pre-hash-partitioned,
  * per-bucket-sorted storage lets every future equi-join or
  * aggregation on the bucket key run WITHOUT a shuffle. This spec
  * proves the property end-to-end on this engine's tables — written
  * once with `bucketBy`, the join plans no exchange at all.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket")
    spark.sql("DROP TABLE IF EXISTS bspec_docs")
    spark.sql("DROP TABLE IF EXISTS bspec_stats")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.select(col("doc_id"), col("text"), col("lang"))
      .write.format("parquet").bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$dir/docs").saveAsTable("bspec_docs")
    docs.select(col("doc_id"), col("n_chars"))
      .write.format("parquet").bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$dir/stats").saveAsTable("bspec_stats")
    // forbid the broadcast escape hatch so the join must co-locate
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // join AND aggregate on the bucket key: both consume the
      // storage-provided hash distribution, so the whole plan needs
      // no exchange (an aggregation on another key would still
      // shuffle its tiny post-join result — that part is inherent)
      val j = spark.table("bspec_docs")
        .join(spark.table("bspec_stats"), "doc_id")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      val rows = j.collect()
      assert(rows.nonEmpty)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning") &&
        !plan.contains("ShuffleExchange"),
        s"bucketed join still shuffles:\n$plan")
      // sanity: the same join over plain parquet DOES shuffle — the
      // assertion above is meaningful, not vacuous
      val plain = docs.select(col("doc_id"), col("text"), col("lang"))
        .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      plain.collect()
      assert(plain.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "control join unexpectedly shuffle-free")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bspec_docs")
      spark.sql("DROP TABLE IF EXISTS bspec_stats")
    }
  }
}
