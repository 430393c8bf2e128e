package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.expressions.PrefixShingles

// Throwaway dev probe (not part of the library surface).
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(d + "/documents.parquet")
    val sets = graft.operators.Dedup.shingleSets(docs)
    sets.count()
    val df = sets.select(explode(col("set")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt))
    for (k <- Seq(8, 12, 16, 24)) {
      val t0 = System.nanoTime()
      val prefixes = sets.select(col("doc_id"), col("n"),
        explode(PrefixShingles.prefix_shingles(col("set"), df, k, 4, 5)).as("h"))
      val cands = prefixes.as("x")
        .join(prefixes.as("y"), col("x.h") === col("y.h") &&
          col("x.doc_id") < col("y.doc_id") &&
          col("x.n") * 4 <= col("y.n") * 5 && col("y.n") * 4 <= col("x.n") * 5)
        .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .agg(count(lit(1)).as("shared"),
          first(col("x.n")).as("xn"), first(col("y.n")).as("yn"))
        .filter(col("shared") >= least(lit(k),
          expr("(xn * 4 + 4) div 5"), expr("(yn * 4 + 4) div 5")))
      println(s"K=$k cands=" + cands.count() + " in " + (System.nanoTime()-t0)/1e9)
    }
    spark.stop()
  }
}
