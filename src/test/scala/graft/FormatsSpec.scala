package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format breadth: the engine's ingest surface is not parquet-
  * only — CSV, JSON-lines and ORC all round-trip the same relational
  * content (explicit schema, no inference surprises), proving any of
  * them can stand where the parquet scans do in the declared queries. */
class FormatsSpec extends SparkSpec {

  private def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      sum(round(col("l_extendedprice") * 100).cast("long")
        + col("l_orderkey") * 7 + col("l_linenumber")).cast("long"))
      .collect().head
    (r.getLong(0), r.getLong(1))
  }

  private lazy val src = Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"), col("l_returnflag"))
  private lazy val schema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", LongType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_returnflag", StringType)))

  private def tmp(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft-fmt-$tag").toString + "/data"

  test("CSV round-trips with an explicit schema") {
    val dir = tmp("csv")
    src.write.option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(checksum(back) == checksum(src))
  }

  test("JSON-lines round-trips with an explicit schema") {
    val dir = tmp("json")
    src.write.json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(checksum(back) == checksum(src))
  }

  test("ORC round-trips and carries predicate pushdown") {
    val dir = tmp("orc")
    src.write.orc(dir)
    val back = spark.read.orc(dir).filter(col("l_returnflag") === "R")
    // same content under the same filter...
    assert(checksum(back) ==
      checksum(src.filter(col("l_returnflag") === "R")))
    // ...and the filter actually reached the ORC scan
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("l_returnflag"), s"no pushed filter in:\n$plan")
  }
}
