package graft

import java.nio.file.Files

import graft.streaming.MaterializedAggregate

class MaterializedAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    Files.createTempDirectory("magg").toString

  // (operation, grp, value_m, old_grp, old_value_m)
  private type Chg = (String, String, Long, String, Long)

  private def state(ma: MaterializedAggregate): Map[String, (Long, Long)] =
    ma.current(spark).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("inserts, deletes and group-moving updates maintain exact aggregates") {
    val ma = new MaterializedAggregate(tmp())
    assert(ma.applyBatch(Seq[Chg](
      ("insert", "a", 100L, null, 0L),
      ("insert", "a", 50L, null, 0L),
      ("insert", "b", 10L, null, 0L))
      .toDF("operation", "grp", "value_m", "old_grp", "old_value_m"), 0L))
    assert(state(ma) == Map("a" -> (2L, 150L), "b" -> (1L, 10L)))
    // update moving a row from a (100) to b (70); delete b's 10-row
    assert(ma.applyBatch(Seq[Chg](
      ("UPDATE", "b", 70L, "a", 100L),
      ("DELETE", null, 0L, "b", 10L))
      .toDF("operation", "grp", "value_m", "old_grp", "old_value_m"), 1L))
    assert(state(ma) == Map("a" -> (1L, 50L), "b" -> (1L, 70L)))
  }

  test("a group emptied by deletes disappears from the state") {
    val ma = new MaterializedAggregate(tmp())
    ma.applyBatch(Seq[Chg](("insert", "only", 7L, null, 0L))
      .toDF("operation", "grp", "value_m", "old_grp", "old_value_m"), 0L)
    ma.applyBatch(Seq[Chg](("delete", null, 0L, "only", 7L))
      .toDF("operation", "grp", "value_m", "old_grp", "old_value_m"), 1L)
    assert(state(ma).isEmpty)
  }

  test("replayed batchIds are no-ops; empty batches commit log-only") {
    val ma = new MaterializedAggregate(tmp())
    val b0 = Seq[Chg](("insert", "a", 5L, null, 0L))
      .toDF("operation", "grp", "value_m", "old_grp", "old_value_m")
    assert(ma.applyBatch(b0, 0L))
    // at-least-once replay of the same batchId must not double-count
    assert(!ma.applyBatch(b0, 0L))
    assert(state(ma) == Map("a" -> (1L, 5L)))
    // idle trigger: state unchanged, commit recorded
    assert(ma.applyBatch(b0.limit(0), 1L))
    assert(state(ma) == Map("a" -> (1L, 5L)))
    assert(ma.commits().map(_._1) == Seq(0L, 1L))
  }

  test("streaming e2e: foreachBatch maintains the aggregate across micro-batches") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ma = new MaterializedAggregate(tmp())
    val in = MemoryStream[Chg]
    val q = in.toDF()
      .toDF("operation", "grp", "value_m", "old_grp", "old_value_m")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        ma.applyBatch(b, id); ()
      }
      .start()
    in.addData(("insert", "a", 10L, null, 0L), ("insert", "b", 5L, null, 0L))
    q.processAllAvailable()
    in.addData(("update", "b", 9L, "a", 10L))
    q.processAllAvailable()
    q.stop()
    assert(state(ma) == Map("b" -> (2L, 14L)))
  }

  test("incremental state equals a brute-force recompute of the applied table") {
    val rnd = new scala.util.Random(7)
    val ma = new MaterializedAggregate(tmp())
    // model table: key -> (grp, value); drive random CDC traffic
    var table = Map.empty[Int, (String, Long)]
    var batchId = 0L
    for (_ <- 0 until 6) {
      val chgs = (0 until 30).flatMap { _ =>
        val k = rnd.nextInt(20)
        table.get(k) match {
          case None =>
            val g = s"g${rnd.nextInt(4)}"; val v = rnd.nextInt(1000).toLong
            table += k -> (g, v)
            Seq(("insert", g, v, null: String, 0L))
          case Some((og, ov)) if rnd.nextBoolean() =>
            val g = s"g${rnd.nextInt(4)}"; val v = rnd.nextInt(1000).toLong
            table += k -> (g, v)
            Seq(("update", g, v, og, ov))
          case Some((og, ov)) =>
            table -= k
            Seq(("delete", null: String, 0L, og, ov))
        }
      }
      ma.applyBatch(chgs.toDF(
        "operation", "grp", "value_m", "old_grp", "old_value_m"), batchId)
      batchId += 1
    }
    val want = table.values.groupBy(_._1).map { case (g, vs) =>
      g -> (vs.size.toLong, vs.map(_._2).sum)
    }
    assert(state(ma) == want)
  }
}
