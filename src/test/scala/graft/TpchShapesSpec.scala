package graft

/** Semantic invariants for the round's TPC-H-shape additions — the
  * properties the DuckDB hash-compare can't state (ratios bounded,
  * histograms conserving mass, argmax uniqueness), checked at sf0.001.
  */
class TpchShapesSpec extends SparkSpec {

  test("q_market_share is a proper share: every year in [0, 1]") {
    val rows = SparkEntry.queries("q_market_share")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share $share out of range")
    }
  }

  test("q_top_supplier returns the max of the quarterly revenue ranking") {
    val rows = SparkEntry.queries("q_top_supplier")(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, s"tied winners must share one revenue: $revs")
  }

  test("q_order_streaks histogram conserves the customer mass") {
    import org.apache.spark.sql.functions._
    val hist = SparkEntry.queries("q_order_streaks")(spark, sf).collect()
    val nCustomers = Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(hist.map(_.getLong(1)).sum == nCustomers,
      "every ordering customer has exactly one best streak")
    hist.foreach(r => assert(r.getLong(0) >= 1))
  }

  test("q_priority_late counts a subset of the quarter's orders") {
    import org.apache.spark.sql.functions._
    val late = SparkEntry.queries("q_priority_late")(spark, sf)
      .agg(sum(col("order_count"))).head().getLong(0)
    val all = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .count()
    assert(late > 0 && late <= all, s"late=$late all=$all")
  }

  test("q_volume_shipping covers both trade directions") {
    val rows = SparkEntry.queries("q_volume_shipping")(spark, sf).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).distinct
    assert(pairs.forall { case (sn, cn) => sn != cn })
    assert(pairs.nonEmpty)
  }

  test("q_regional_best_supplier yields one supplier per part") {
    val rows = SparkEntry.queries("q_regional_best_supplier")(spark, sf)
      .collect()
    val parts = rows.map(_.getLong(3))
    assert(parts.distinct.length == parts.length, "duplicate part rows")
  }

  test("q_user_paths are 3-step paths with positive support") {
    val rows = SparkEntry.queries("q_user_paths")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getString(0).count(_ == '>') == 2, s"not 3-step: ${r.getString(0)}")
      assert(r.getLong(1) > 0)
    }
  }

  test("emb_pair_hist bins cover [-1, 1] and pair mass matches the sample") {
    val rows = SparkEntry.queries("emb_pair_hist")(spark, sf).collect()
    val nPairs = rows.map(_.getLong(1)).sum
    val sampleN = Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.expr(
        "cast(conv(substring(md5(cast(vec_id as string)), 1, 8), 16, 10)" +
          " as bigint) % 4 = 0")).count()
    assert(nPairs == sampleN * (sampleN - 1) / 2,
      s"pair mass $nPairs != C($sampleN, 2)")
    rows.foreach { r =>
      val bin = r.getLong(0)
      assert(bin >= -10 && bin <= 10, s"bin $bin outside cosine range")
    }
  }

  test("corpus_card dup accounting is consistent") {
    val rows = SparkEntry.queries("corpus_card")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nUnique, nDup) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDup == nDocs - nUnique && nUnique <= nDocs && nUnique > 0)
      assert(r.getLong(8) <= nDocs, "top_lang_docs bounded by n_docs")
    }
  }

  test("text_keywords ranks at most 5 per source, lift >= base rate") {
    val rows = SparkEntry.queries("text_keywords")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length))
    }
  }
}
