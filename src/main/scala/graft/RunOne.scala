package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run one named query N times against a sf dir and print
  * per-run wall time — the fast inner loop for plan tuning that Bench
  * (all queries) is too slow for. `runMain graft.RunOne <name> [sfDir] [n]`.
  * Pass `explain` as n to print the formatted physical plan instead.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules", Tuning.excludedRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 2 && args(2) == "explain") {
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    } else if (args.length > 2 && args(2) == "explainExec") {
      // AQE finalizes (and stage-dedups) only at execution: the
      // build-time plan shows duplicated exchanges that the runtime
      // reuses. Collect first, then print what actually ran.
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    } else {
      val n = if (args.length > 2) args(2).toInt else 3
      for (i <- 1 to n) {
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"RUN $i%d ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      }
    }
    spark.stop()
  }
}
