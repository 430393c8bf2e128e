package graft

/** Invariants for the multimodal plumbing queries (the decode STUB is
  * deterministic, so these check the Spark-side shapes: typed decode,
  * frame explode, resize planning, per-shard batch assembly). */
class MultimodalSpec extends SparkSpec {

  test("resize plan aspect-fits into 224 with integer rounding") {
    val rows = SparkEntry.queries("mm_resize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(math.max(ow, oh) == 224, s"doc ${r.getLong(0)}")
      assert(ow <= 224 && oh <= 224)
      // integer aspect preservation: floor(short * 224 / long)
      if (w >= h) assert(oh == h * 224 / w) else assert(ow == w * 224 / h)
    }
  }

  test("batch plan packs shard frames into consecutive batches of <= 32") {
    val rows = SparkEntry.queries("mm_batch_plan")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (shard, bs) =>
      val ids = bs.map(_._2).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq,
        s"shard $shard batch ids not consecutive: ${ids.toSeq}")
      // all full batches of 32 except possibly the last
      bs.sortBy(_._2).dropRight(1).foreach { case (_, b, n) =>
        assert(n == 32, s"shard $shard batch $b has $n items")
      }
      assert(bs.maxBy(_._2)._3 <= 32)
    }
    // batches partition the frame stream exactly
    val frames = SparkEntry.queries("mm_frame_sample")(spark, sf).count()
    assert(rows.map(_._3).sum == frames)
  }
}
