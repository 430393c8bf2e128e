package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Proof that the engine's partitioned-layout claims hold: a
  * date-partitioned parquet table serves a date-filtered query by
  * reading ONLY the matching partition directories — the mechanism
  * that turns a 100 TB full-history scan into a single-day read. The
  * assertions are on the executed scan's ACTUAL file count (the
  * `numFiles` metric after the job ran), not plan strings, so a
  * silent pruning regression fails loudly. (`DataFrame.inputFiles`
  * deliberately NOT used: it lists the relation's full file index
  * before partition filters apply.)
  */
class PartitionPruningSpec extends SparkSpec {

  /** Files the executed scan actually enumerated. */
  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  private def writePartitioned(): String = {
    val dir = Files.createTempDirectory("graft-prune").toString
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    dir
  }

  test("date-partitioned writes prune to the filtered day's files") {
    val dir = writePartitioned()
    val total = filesRead(spark.read.parquet(dir))
    assert(spark.read.parquet(dir).select(col("day")).distinct().count() > 1,
      "corpus must span multiple days for this proof")
    val oneDay = spark.read.parquet(dir)
      .filter(col("day") === "2024-01-02")
    assert(oneDay.count() > 0, "filtered day must exist")
    val pruned = filesRead(oneDay)
    assert(pruned < total,
      s"pruning read $pruned of $total files — no partitions eliminated")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("a range filter prunes to the matching partition subset") {
    val dir = writePartitioned()
    val total = filesRead(spark.read.parquet(dir))
    val week = spark.read.parquet(dir)
      .filter(col("day") >= "2024-01-01" && col("day") <= "2024-01-03")
    assert(week.count() > 0)
    val pruned = filesRead(week)
    assert(pruned < total, s"range pruning read $pruned of $total files")
  }
}
