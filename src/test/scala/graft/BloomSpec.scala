package graft

import graft.expressions.Bloom.{bloom_agg, bloom_might_contain}
import org.apache.spark.sql.functions._

/** Bloom runtime-filter semantics: zero false negatives (the property
  * the prefilter+exact-join equivalence rests on), merge-order
  * invariance of the built filter, a false-positive rate consistent
  * with the m/k sizing, SQL registration, and the end-to-end
  * equivalence text_bloom_decon ≡ text_decontaminate.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 17 // 131072 bits
  private val K = 7

  test("no false negatives: every inserted value probes true") {
    val vals = (0L until 5000L).map(i => i * 0x9E3779B97F4A7C15L + i)
    val bf = vals.toDF("h").agg(bloom_agg(col("h"), M, K).as("bf"))
    val misses = vals.toDF("h").crossJoin(bf)
      .filter(!bloom_might_contain(col("bf"), col("h"))).count()
    assert(misses == 0L)
  }

  test("false-positive rate matches the m/k sizing") {
    // n=5000 into m=131072/k=7: (1 - e^(-kn/m))^k ~ 2.3e-4 — assert
    // an order of magnitude of headroom, not the exact expectation
    val ins = (0L until 5000L).map(i => i * 0x9E3779B97F4A7C15L + i)
    val bf = ins.toDF("h").agg(bloom_agg(col("h"), M, K).as("bf"))
    val probes = (1L to 100000L).map(i => -i * 0x6C8E9CF570932BD5L)
    val fp = probes.toDF("h").crossJoin(bf)
      .filter(bloom_might_contain(col("bf"), col("h"))).count()
    assert(fp < 250, s"false-positive count $fp implausible for m=$M k=$K")
  }

  test("built filter is bit-identical under any partitioning") {
    val df = (0L until 2000L).map(i => i * 31L + 7L).toDF("h")
    def words(parts: Int): Seq[Long] =
      df.repartition(parts).agg(bloom_agg(col("h"), M, K))
        .head().getSeq[Long](0)
    val one = words(1)
    assert(one.take(2) == Seq(M.toLong, K.toLong),
      "filter must carry its [m, k] header")
    assert(one == words(4))
    assert(one == words(13))
  }

  test("bloom_agg / bloom_might_contain work from SQL") {
    Graft.register(spark)
    (1L to 100L).toDF("h").createOrReplaceTempView("bloom_in")
    val n = spark.sql(
      s"""SELECT count(*) AS n FROM (
         |  SELECT h, (SELECT bloom_agg(h, 65536, 5) FROM bloom_in) AS bf
         |  FROM bloom_in) WHERE bloom_might_contain(bf, h)""".stripMargin)
      .head().getLong(0)
    assert(n == 100L)
  }

  test("text_bloom_decon equals text_decontaminate row for row") {
    val a = SparkEntry.queries("text_decontaminate")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("text_bloom_decon")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }
}
