package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev harness: dump `explain("formatted")` for every declared query
  * (or a comma-separated subset) to one file each in one JVM session —
  * the batch face of `RunOne <q> <sf> explain`, used by the
  * optimization rounds to snapshot before/after plans cheaply.
  * `runMain graft.PlanDump <sfDir> <outDir> [q1,q2,...] [exec]`
  * With `exec`, runs each query first and dumps the AQE-finalized
  * executedPlan instead of the build-time plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Set[String] =
      if (args.length > 2 && args(2) != "exec")
        args(2).split(",").map(_.trim).toSet
      else Set.empty
    val exec = args.contains("exec")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.optimizer.excludedRules", Tuning.excludedRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt =
            if (exec) { df.collect(); df.queryExecution.executedPlan.toString }
            else df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(s"$outDir/$name.txt"), txt.getBytes("UTF-8"))
          System.err.println(s"plandump: $name ok")
        } catch { case t: Throwable =>
          System.err.println(s"plandump: $name FAILED ${t.getMessage}")
        }
      }
    spark.stop()
  }
}
