package graft

/** Semantic invariants for the round's diagnostic/report queries —
  * the properties a hash-compare can't state (shares bounded and
  * monotone, histograms conserving mass, recall caps), at sf0.001.
  */
class ReportInvariantsSpec extends SparkSpec {

  test("q_revenue_pareto shares are nested and within [0, 1]") {
    val r = SparkEntry.queries("q_revenue_pareto")(spark, sf).head()
    val (s1, s10, s20) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(s1 > 0 && s1 <= s10 && s10 <= s20 && s20 <= 1.0,
      s"shares not nested: $s1 $s10 $s20")
  }

  test("q_benford ppm masses a near-complete million") {
    val rows = SparkEntry.queries("q_benford")(spark, sf).collect()
    val ppm = rows.map(_.getLong(2)).sum
    // integer floor division loses < 1 ppm per digit row
    assert(ppm > 1000000L - rows.length && ppm <= 1000000L, s"ppm=$ppm")
    rows.foreach(r => assert(r.getLong(0) >= 1 && r.getLong(0) <= 9))
  }

  test("q_skew_report: max >= mean for every key, skew >= 100") {
    SparkEntry.queries("q_skew_report")(spark, sf).collect().foreach { r =>
      val (nKeys, total, maxK, skew) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(maxK * nKeys >= total, "max below mean is impossible")
      assert(skew >= 100, s"skew_x100 $skew < its own floor")
    }
  }

  test("text_vocab_growth is cumulative and monotone") {
    val rows = SparkEntry.queries("text_vocab_growth")(spark, sf).collect()
    assert(rows.nonEmpty)
    val vocab = rows.map(_.getLong(2))
    assert(vocab.sameElements(vocab.sorted), "vocab_size must be monotone")
    assert(vocab.last == rows.map(_.getLong(1)).sum,
      "final vocab equals the sum of per-decile novelty")
  }

  test("emb_quantize_recall is bounded by k and mostly high") {
    val rows = SparkEntry.queries("emb_quantize_recall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) <= 10))
    // int8 over 64 dims barely moves a cosine ranking: demand a sane floor
    val mean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    assert(mean >= 5.0, s"mean recall@10 $mean suspiciously low")
  }

  test("dedup_cluster_hist conserves clustered-doc mass") {
    import org.apache.spark.sql.functions._
    val hist = SparkEntry.queries("dedup_cluster_hist")(spark, sf).collect()
    val docs = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    val clustered = SparkEntry.queries("dedup_cluster")(spark, sf).count()
    assert(docs == clustered, s"histogram mass $docs != $clustered docs")
    hist.foreach(r => assert(r.getLong(0) >= 2, "clusters have >= 2 members"))
  }

  test("text_pii_report accounting is internally consistent") {
    SparkEntry.queries("text_pii_report")(spark, sf).collect().foreach { r =>
      val (nDocs, dEmail, nEmails, dCard, nCards, clean) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(nEmails >= dEmail && nCards >= dCard)
      assert(clean <= nDocs && clean >= nDocs - dEmail - dCard)
    }
  }

  test("mm_av_align windows used are bounded by frames sampled") {
    SparkEntry.queries("mm_av_align")(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        "distinct windows cannot exceed sampled frames")
    }
  }
}
