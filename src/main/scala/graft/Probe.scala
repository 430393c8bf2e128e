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
    val K = 16
    var t0 = System.nanoTime()
    def t(label: String)(body: => Long): Unit = {
      t0 = System.nanoTime()
      val n = body
      println(label + "=" + n + " in " + (System.nanoTime()-t0)/1e9)
    }
    val sets = graft.operators.Dedup.shingleSets(docs)
    t("sets")(sets.count())
    val sh = sets.select(col("doc_id"), col("n"), explode(col("set")).as("h"))
    t("sh")(sh.count())
    val dfT = sh.groupBy(col("h")).agg(count(lit(1)).as("df")).filter(col("df") >= 2)
    t("df")(dfT.count())
    val pref = sh.join(broadcast(dfT), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("sorted2"),
        first(col("n")).as("n"), count(lit(1)).as("n2"))
      .withColumn("plen", least(col("n"), col("n") - expr("(n * 4 + 4) div 5") + K))
      .withColumn("plen2", greatest(lit(0L), col("plen") - (col("n") - col("n2"))).cast("int"))
      .select(col("doc_id"), col("n"),
        expr("transform(slice(sorted2, 1, plen2), x -> x.h)").as("prefix"))
    t("pref")(pref.count())
    val prefixes = pref.select(col("doc_id"), col("n"), explode(col("prefix")).as("h")).cache()
    t("prefixes")(prefixes.count())
    val candidates = prefixes.as("x")
      .join(prefixes.as("y"), col("x.h") === col("y.h") &&
        col("x.doc_id") < col("y.doc_id") &&
        col("x.n") * 4 <= col("y.n") * 5 && col("y.n") * 4 <= col("x.n") * 5)
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"), first(col("x.n")).as("xn"), first(col("y.n")).as("yn"))
      .filter(col("shared") >= least(lit(K), expr("(xn * 4 + 4) div 5"), expr("(yn * 4 + 4) div 5")))
      .select(col("a_id"), col("b_id"))
    t("cands")(candidates.count())
    t("full")(graft.operators.Dedup.queries("dedup_ngram_jaccard")(spark, d).count())
    t("full2")(graft.operators.Dedup.queries("dedup_ngram_jaccard")(spark, d).count())
    spark.stop()
  }
}
