package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    var t0 = System.nanoTime()
    val ss = graft.operators.Dedup.shingleSets(docs)
    println("sets=" + ss.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.minhashPairs(docs)
      .select(col("a_id"), col("b_id")).localCheckpoint()
    println("pairs=" + pairs.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val cc = graft.operators.Pipeline.connectedComponents(pairs)
    println("cc=" + cc.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val cc2 = graft.operators.Pipeline.connectedComponents(pairs)
    println("cc2=" + cc2.count() + " in " + (System.nanoTime()-t0)/1e9)
    spark.stop()
  }
}
