package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.operators.DistributedRank

/** The distributed positional-rank/prefix-sum kernel against the one
  * thing it replaced: Spark's own single-partition global window.
  * Randomized datasets (duplicate keys, negative values, skewed
  * distributions, sizes straddling the partition count) must produce
  * byte-identical ranks and running sums under BOTH plans — plus the
  * structural guarantees (no unpartitioned window over the data, the
  * totals frame agrees with a direct aggregate).
  */
class DistributedRankSpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        // each case runs two Spark jobs — keep the count bench-friendly
        .withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  // (key, value) rows: keys drawn from a SMALL domain so duplicate
  // ranking keys are common (the tiebreaker must carry the order),
  // values signed so running sums cross zero, sizes from 1 row (fewer
  // than any partition count) to a few thousand (more than 8 ranges)
  private val genRows: Gen[List[(Long, Long)]] = for {
    n <- Gen.oneOf(1, 2, 7, 64, 257, 2048)
    skewed <- Gen.oneOf(true, false)
    rows <- Gen.listOfN(n, for {
      k <- if (skewed) Gen.frequency(8 -> Gen.const(42L),
        2 -> Gen.choose(0L, 9L)) else Gen.choose(0L, 99L)
      v <- Gen.choose(-1000L, 1000L)
    } yield (k, v))
  } yield rows

  test("rankPrefix reproduces the single-partition global window exactly") {
    import spark.implicits._
    check(Prop.forAll(genRows) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, k, v) }
        .toDF("id", "k", "v")
      val order = Seq(col("k").desc, col("id"))
      // truth: the single-task shape the kernel replaced
      val w = Window.orderBy(order: _*)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val truth = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("v")).over(wRun))
        .select("id", "rn", "cum").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val (ranked, totals) = DistributedRank.rankPrefix(
        df, order, "rn", value = Some(col("v")), cumName = "cum",
        parts = 8)
      val got = ranked.select("id", "rn", "cum").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val t = totals.collect().head
      got == truth &&
        t.getLong(0) == rows.size &&
        t.getLong(1) == rows.map(_._2).sum
    })
  }

  test("ntileOf matches Spark's NTILE for every (n, k) fill shape") {
    import spark.implicits._
    check(Prop.forAll(Gen.choose(1, 40), Gen.oneOf(2, 3, 7, 10)) { (n, k) =>
      val df = (0 until n).map(_.toLong).toDF("id")
      val truth = df
        .withColumn("t", ntile(k).over(Window.orderBy(col("id"))).cast("long"))
      val got = truth
        .withColumn("rn", row_number().over(Window.orderBy(col("id")))
          .cast("long"))
        .withColumn("g", DistributedRank.ntileOf(col("rn"), lit(n.toLong), k))
      got.filter(col("t") =!= col("g")).isEmpty
    })
  }

  test("the kernel's only global window is the bounded per-range offsets table") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, (i * 37 % 11).toLong))
      .toDF("id", "k")
    val (ranked, _) = DistributedRank.rankPrefix(
      df, Seq(col("k"), col("id")), "rn")
    val globals = ranked.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    // every empty-partition window must sit over the __pid aggregate
    // (PlanAuditSpec.isRangeOffsetsTable applies the same test to all
    // 243 declared queries; this pins the kernel in isolation)
    assert(globals.forall(_.child.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.groupingExpressions.exists(
          _.references.exists(_.name == "__pid")) => a
    }.isDefined), "kernel leaked an unbounded global window")
  }

  test("the two kernel passes execute ONE range exchange (ReusedExchange)") {
    // rankPrefix's EXACTNESS depends on the offsets aggregate and the
    // main window pass reading the SAME repartitionByRange exchange:
    // RangePartitioner samples boundaries per execution, so if the two
    // subplans ever ran separate exchanges (exchange reuse disabled, a
    // future plan change breaking canonical matching), their __pid
    // boundaries could differ and the broadcast offsets would attach
    // to the wrong ranges — wrong ranks with NO error (round-13
    // advisory). Pin the invariant: after execution, the adaptive plan
    // carries exactly one materialized range exchange and at least one
    // ReusedExchange pointing at it.
    import spark.implicits._
    val df = (0 until 5000).map(i => (i.toLong, (i * 37 % 101).toLong))
      .toDF("id", "k")
    val (ranked, _) = DistributedRank.rankPrefix(
      df, Seq(col("k"), col("id")), "rn", value = Some(col("k")),
      parts = 8)
    ranked.collect()
    // the adaptive plan's toString prints the FINAL plan first and the
    // pre-execution Initial Plan after it — only the final section
    // reflects what ran
    val plan = ranked.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // a ReusedExchange line NAMES its target exchange, so exclude it
    // from the materialized-exchange count
    val ranges = plan.split("\n")
      .count(l => l.contains("Exchange rangepartitioning") &&
        !l.contains("ReusedExchange"))
    assert(ranges == 1,
      s"expected exactly ONE materialized range exchange, saw $ranges:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"offsets pass no longer reuses the range exchange — boundary " +
        s"drift between passes would corrupt ranks silently:\n$plan")
  }
}
