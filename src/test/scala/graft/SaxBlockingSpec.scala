package graft

import graft.operators.SaxBlocking
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the generated corpus-adaptive SAX blocking SQL
  * (SaxBlocking.scala). The test corpora sit at b = 1 (150/1500
  * users), so the oracle gate alone never exercises the b > 1 arms of
  * the generated word expression — this spec evaluates them directly:
  * ladder boundaries, byte-identity of b = 1 with the original sign
  * word, and hand-computed b = 2 / b = 3 symbols at the |z|-quantile
  * breakpoints. */
class SaxBlockingSpec extends SparkSpec {
  import spark.implicits._

  private def withWeeklyCols(df: DataFrame): DataFrame = {
    val base = df
      .withColumn("sx", expr("w0+w1+w2+w3+w4+w5"))
      .withColumn("sxx", expr(
        "cast(w0 as decimal(38,0))*w0 + cast(w1 as decimal(38,0))*w1" +
          " + cast(w2 as decimal(38,0))*w2 + cast(w3 as decimal(38,0))*w3" +
          " + cast(w4 as decimal(38,0))*w4 + cast(w5 as decimal(38,0))*w5"))
      .withColumn("vx", expr("6 * sxx - cast(sx as decimal(38,0)) * sx"))
    (0 until 6).foldLeft(base) { (d, i) =>
      d.withColumn(s"d$i", expr(s"6 * w$i - sx"))
        .withColumn(s"q$i", expr(s"cast(d$i as decimal(38,0)) * d$i * 1000"))
    }
  }

  private def word(vec: Seq[Long], b: Int): String =
    withWeeklyCols(Seq(Tuple6(vec(0), vec(1), vec(2), vec(3), vec(4),
      vec(5))).toDF("w0", "w1", "w2", "w3", "w4", "w5"))
      .withColumn("b", lit(b))
      .withColumn("word", expr(SaxBlocking.wordSqlSpark("b",
        (0 until 6).map(i => s"d$i"), (0 until 6).map(i => s"q$i"), "vx")))
      .select("word").as[String].head()

  test("b ladder: boundaries are exact and monotone") {
    val cases = Seq(
      1L -> 1, 47775744L -> 1, 47775745L -> 2, // 65536 * 3^6
      1024000000L -> 2, 1024000001L -> 3, // 65536 * 5^6
      65536L * 117649L -> 3, 65536L * 117649L + 1 -> 4, // 7^6
      65536L * 11390625L -> 7, 65536L * 11390625L + 1 -> 8, // 15^6
      Long.MaxValue -> 8)
    val got = cases.map(_._1).toDF("n_users")
      .withColumn("b", expr(SaxBlocking.bLadderSql("n_users")))
      .select("n_users", "b").as[(Long, Int)].collect().toMap
    for ((n, expected) <- cases)
      assert(got(n) == expected, s"ladder(n=$n): got ${got(n)}")
  }

  test("b = 1 word is byte-identical to the original sign word") {
    val vecs = Seq(
      Seq(10L, 20L, 30L, 40L, 50L, 60L),
      Seq(5L, 5L, 5L, 5L, 5L, 100L),
      Seq(100L, 1L, 1L, 1L, 1L, 1L),
      Seq(7L, 9L, 8L, 12L, 6L, 11L))
    for (v <- vecs) {
      val sx = v.sum
      val legacy = v.map(w =>
        if (6 * w > sx) 'a' else if (6 * w < sx) 'c' else 'b').mkString
      assert(word(v, 1) == legacy, s"b=1 word for $v")
    }
    // exact-mean week -> 'b' (the zero symbol)
    assert(word(Seq(10L, 10L, 10L, 10L, 5L, 15L), 1) == "bbbbca")
  }

  test("b = 2 splits each sign at the |z| median (t^2 = 0.455)") {
    // chars for b = 2: strong-pos 'a', weak-pos 'b', zero 'c',
    // weak-neg 'd', strong-neg 'e'
    // vec (8,8,8,8,8,20): sx = 60, d = (-12,..,-12, 60),
    // vx = 6*(5*64+400) - 3600 = 720; |z_i| = |d|/sqrt(vx):
    // weeks 0-4: z^2*1000 = 144*1000/720 = 200 < 455 -> weak-neg 'd'
    // week 5: z^2*1000 = 3600*1000/720 = 5000 >= 455 -> strong-pos 'a'
    assert(word(Seq(8L, 8L, 8L, 8L, 8L, 20L), 2) == "ddddda")
    // uniform-ish (9,11,9,11,9,11): sx = 60, d = +-6,
    // vx = 6*(3*81+3*121) - 3600 = 36; z^2*1000 = 36000/36 = 1000
    // >= 455 -> every week is a STRONG symbol ('e' neg / 'a' pos)
    assert(word(Seq(9L, 11L, 9L, 11L, 9L, 11L), 2) == "eaeaea")
  }

  test("b = 3 terciles order magnitudes within a sign") {
    // b = 3 chars: pos bands 'c','b','a' (weak->strong), zero 'd',
    // neg bands 'e','f','g'. Breakpoints t^2 = 186, 936 per mille.
    // vec (10,10,10,10,4,16): sx = 60, d = (0,0,0,0,-36,36),
    // vx = 6*(4*100+16+256) - 3600 = 432;
    // z^2*1000 = 1296*1000/432 = 3000 >= 936 -> strongest band both
    // signs; zero weeks -> 'd'
    assert(word(Seq(10L, 10L, 10L, 10L, 4L, 16L), 3) == "ddddga")
    // middle band: need 186 <= z^2*1000 < 936
    // vec (12,12,12,12,12,30): sx = 90, d = (-18,...,-18, 90),
    // vx = 6*(5*144+900) - 8100 = 1620; weeks 0-4: 324000/1620 = 200
    // (middle neg band 'f'); week 5: 8100000/1620 = 5000 (strong 'a')
    assert(word(Seq(12L, 12L, 12L, 12L, 12L, 30L), 3) == "fffffa")
  }

  test("word alphabet is bounded by 2b+1 letters for every b") {
    val vecs = for (a <- 1L to 5L; z <- 1L to 3L)
      yield Seq(a, z, a * 2, z * 3, a + z, 7L)
    for (b <- 1 to 8; v <- vecs) {
      val w = word(v, b)
      assert(w.length == 6)
      assert(w.forall(c => c >= 'a' && c <= ('a' + 2 * b).toChar),
        s"b=$b word $w out of alphabet")
    }
  }
}
