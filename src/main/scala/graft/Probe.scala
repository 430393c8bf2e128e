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
    println("docs=" + docs.count())
    println(docs.select(avg(length(col("text"))), max(length(col("text")))).collect().mkString)
    val sh = docs.select(col("doc_id"), explode(array_distinct(expr(
      "transform(sequence(1, greatest(1, length(text) - 7)), i -> substring(text, i, 8))"))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    var t0 = System.nanoTime()
    println("shingle rows=" + sh.count() + " in " + (System.nanoTime()-t0)/1e9)
    val df = broadcast(sh.groupBy(col("h")).agg(count(lit(1)).as("df")))
    val withDf = sh.join(df, Seq("h"))
    val K = 16
    val sets = withDf.groupBy(col("doc_id")).agg(
      array_sort(collect_list(struct(col("df"), col("h")))).as("sorted"), count(lit(1)).as("n"))
      .withColumn("plen", least(col("n"), col("n") - expr("(n * 4 + 4) div 5") + lit(K)).cast("int"))
      .withColumn("prefix", expr("transform(filter(slice(sorted, 1, plen), x -> x.df >= 2), x -> x.h)"))
      .select(col("doc_id"), col("n"), col("prefix")).cache()
    t0 = System.nanoTime()
    println("sets=" + sets.count() + " in " + (System.nanoTime()-t0)/1e9)
    val prefixes = sets.select(col("doc_id"), col("n"), explode(col("prefix")).as("h")).cache()
    t0 = System.nanoTime()
    println("prefix rows=" + prefixes.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val joined = prefixes.as("x").join(prefixes.as("y"), col("x.h") === col("y.h") &&
      col("x.doc_id") < col("y.doc_id") && col("x.n")*4 <= col("y.n")*5 && col("y.n")*4 <= col("x.n")*5)
    println("join rows=" + joined.count() + " in " + (System.nanoTime()-t0)/1e9)
    t0 = System.nanoTime()
    val cands = joined.groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"), first(col("x.n")).as("xn"), first(col("y.n")).as("yn"))
      .filter(col("shared") >= least(lit(K), expr("(xn*4+4) div 5"), expr("(yn*4+4) div 5")))
    println("cands=" + cands.count() + " in " + (System.nanoTime()-t0)/1e9)
    spark.stop()
  }
}
