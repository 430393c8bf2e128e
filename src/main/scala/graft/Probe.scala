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
    def t(label: String)(body: => Long): Unit = {
      t0 = System.nanoTime()
      val n = body
      println(label + "=" + n + " in " + (System.nanoTime()-t0)/1e9)
    }
    import graft.expressions.SimHash64.simhash64
    val sigs = docs.select(col("doc_id"),
      simhash64(expr(
        "transform(filter(split(text, '\\\\s+'), t -> t != '')," +
          " t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"))
        .as("sig"))
    t("sigs")(sigs.count())
    t("sigs2")(sigs.count())
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(i => struct(lit(i).as("band"),
        shiftrightunsigned(col("sig"), i * 15).bitwiseAND(lit(0x7FFFL))
          .as("key"))): _*)).as("e"))
      .select(col("doc_id"), col("sig"), col("e.band").as("band"),
        col("e.key").as("key"))
    val joined = banded.as("x")
      .join(banded.as("y"), col("x.band") === col("y.band") &&
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        expr("bit_count(x.sig ^ y.sig)").as("hamming"))
    t("joined")(joined.count())
    t("full")(graft.operators.Dedup.queries("dedup_simhash")(spark, d).count())
    spark.stop()
  }
}
