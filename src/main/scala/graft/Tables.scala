package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md). Every operator in the engine
  * takes the scale-factor directory as a parameter so the same code runs
  * at sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) and, unchanged, on
  * a real cluster at 100 TB: `spark.read.parquet` gives vectorized scans,
  * predicate pushdown and partition pruning for free.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized parquet reader rejects outright. Read nanos as long
    * (legacy conf) and floor-divide to microseconds — the same
    * truncation DuckDB's CAST(ts AS TIMESTAMP) applies, so oracle
    * comparisons stay aligned. Emitted as TIMESTAMP_NTZ to match the
    * file's isAdjustedToUTC=false semantics.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000"))
        .cast("timestamp_ntz"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
