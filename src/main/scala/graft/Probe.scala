package graft

import org.apache.spark.sql.SparkSession

// Throwaway dev probe (not part of the library surface).
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules", Tuning.excludedRules)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.queries("dedup_simhash")
    for (i <- 1 to 4) {
      val tw0 = System.nanoTime()
      q(spark, "/root/testdata/sf0.001").count()
      val tw = (System.nanoTime() - tw0) / 1e9
      val t0 = System.nanoTime()
      q(spark, "/root/testdata/sf0.1").count()
      val t1 = (System.nanoTime() - t0) / 1e9
      println(f"PROBE round $i warm@0.001 $tw%.2f s  timed@0.1 $t1%.2f s")
    }
    spark.stop()
  }
}
