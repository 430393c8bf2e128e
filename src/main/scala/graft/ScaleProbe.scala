package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe main: replicates the sf0.1 tables Nx (ids offset so
  * keys stay distinct) and times the heaviest operators, printing one
  * JSON line of seconds per op at 1x and Nx. The point is the RATIO:
  * near-linear growth means the plan survives scale-up; super-linear
  * growth flags an all-pairs or skew blowup. Not part of the driver
  * contract — a development instrument.
  *
  * Usage: SPARK_GRAFT_SCALE=10 sbt "runMain graft.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, idCols: Seq[String], copies: Int): DataFrame =
      (0 until copies).map { i =>
        idCols.foldLeft(df) { (acc, c) =>
          acc.withColumn(c, col(c) + lit(i.toLong * 10000000L))
        }
      }.reduce(_ unionByName _)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val docs1 = Tables.documents(spark, d)
    val docsN = replicate(docs1, Seq("doc_id"), n)
    val li1 = Tables.lineitem(spark, d)
    val liN = replicate(li1, Seq("l_orderkey"), n)
    val emb1 = Tables.embeddings(spark, d)

    import graft.operators.Dedup
    def ngram(df: DataFrame): Long = {
      // same pipeline as dedup_ngram_jaccard, parameterized by corpus
      val tmp = df.select(col("doc_id"), col("text"))
      tmp.createOrReplaceTempView("scale_docs")
      Dedup.minhashPairs(tmp).count() // minhash path exercises shingle+verify
    }
    def q1(df: DataFrame): Long =
      df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Num.dsum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
        .count()

    q1(li1) // JIT/IO warmup so 1x-vs-Nx ratios compare steady state
    val r = Map(
      "q1_agg_1x" -> time(q1(li1)),
      s"q1_agg_${n}x" -> time(q1(liN)),
      "minhash_1x" -> time(ngram(docs1)),
      s"minhash_${n}x" -> time(ngram(docsN)))
    println("{" + r.map { case (k, v) => f""""$k":$v%.2f""" }
      .mkString(",") + s""","scale":$n}""")
    spark.stop()
  }
}
