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
  /** `events.ts` has shipped as two different physical types across
    * testdata generations: TIMESTAMP(NANOS) (which Spark's vectorized
    * reader only accepts as raw long via the legacy conf) and plain
    * TIMESTAMP(MICROS, isAdjustedToUTC=false). Normalize both to
    * TIMESTAMP_NTZ at the loader so every downstream operator and its
    * DuckDB oracle (`CAST(ts AS TIMESTAMP)` truncates the same way)
    * see one schema regardless of which generation is on disk.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    val ts = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    df.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
