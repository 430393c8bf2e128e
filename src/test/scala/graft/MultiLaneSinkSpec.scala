package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.streaming.{KplAggregate, LocalFilePutClient, OrderedAggregatingWriter}

/** The per-key ordered multi-lane sink — the engine's horizontal
  * scale-out past the reference's one-shard throughput cap
  * (stream.py:15-20; ARCHITECTURE.md "per-key lanes"). Contract under
  * test: with lanes > 1, every record of one partition key (xid) lands
  * on ONE deterministic lane and is delivered in LSN order with
  * lane-local sequence numbers, while distinct keys spread across
  * lanes — exactly what a multi-shard Kinesis stream guarantees a
  * consumer (ordered within a key, unordered across keys).
  */
class MultiLaneSinkSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-lane-spec").toString

  /** Sink contents grouped by lane, each lane's user records
    * concatenated in delivery order: (lane -> Seq((partitionKey,
    * payload))). File names are rec-<batch>-L<lane>-<pos>. */
  private def byLane(dir: String): Map[Int, Seq[(String, String)]] = {
    val d = Paths.get(dir)
    Files.list(d).iterator().asScala.toSeq
      .map(_.getFileName.toString).sorted
      .map { name =>
        val m = "rec-(\\d+)-L(\\d+)-(\\d+)".r.findFirstMatchIn(name)
          .getOrElse(fail(s"unexpected sink file name: $name"))
        (m.group(2).toInt,
          KplAggregate.decode(Files.readAllBytes(d.resolve(name)))
            .map { case (pk, data) => (pk, new String(data, "UTF-8")) })
      }
      .groupBy(_._1)
      .view.mapValues(_.flatMap(_._2)).toMap
  }

  test("per-key LSN order is preserved across 4 lanes with interleaved keys") {
    import spark.implicits._
    val dir = tmp()
    val client = new LocalFilePutClient(s"$dir/sink")
    // tiny aggregate bound: each lane flushes MANY aggregates, so
    // ordering must hold across aggregate boundaries, not just inside
    // one buffer
    val writer = new OrderedAggregatingWriter(client, maxAggBytes = 96,
      lanes = 4)
    // 8 keys x 5 changes each, LSNs globally interleaved across keys
    // (lsn = round * 8 + key): any cross-key reordering between lanes
    // is allowed, any within-key reordering is the bug
    val rows = for (round <- 0 until 5; key <- 0 until 8) yield {
      val lsn = (round * 8 + key).toLong
      (lsn, s"$key:$lsn", key.toLong)
    }
    val batch = rows.toDF("lsn", "fmt_msg", "xid")
    writer.writeBatch(batch, 3L)
    val lanes = byLane(s"$dir/sink")
    assert(lanes.size >= 2,
      s"8 keys over 4 lanes must spread across >1 lane, got ${lanes.keySet}")
    assert(lanes.keySet.forall(l => l >= 0 && l < 4))
    // every key lives on exactly one lane...
    val keyToLanes = lanes.toSeq
      .flatMap { case (lane, recs) => recs.map { case (pk, _) => (pk, lane) } }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(keyToLanes.size == 8, s"all 8 keys must be delivered: $keyToLanes")
    for ((pk, ls) <- keyToLanes)
      assert(ls.size == 1, s"key $pk split across lanes $ls")
    // ...and its records arrive in strictly increasing LSN order
    for ((lane, recs) <- lanes; (pk, perKey) <- recs.groupBy(_._1)) {
      val lsns = perKey.map(_._2.split(":")(1).toLong)
      assert(lsns == lsns.sorted,
        s"key $pk on lane $lane delivered out of LSN order: $lsns")
      assert(lsns.distinct == lsns)
    }
    // nothing lost: 40 user records total across all lanes
    assert(lanes.values.map(_.size).sum == 40)
  }

  test("multi-lane replay of the same batch is idempotent on the file client") {
    import spark.implicits._
    val dir = tmp()
    val client = new LocalFilePutClient(s"$dir/sink")
    val writer = new OrderedAggregatingWriter(client, maxAggBytes = 96,
      lanes = 4)
    val batch = (0 until 12).map(i =>
      (i.toLong, s"${i % 4}:$i", (i % 4).toLong))
      .toDF("lsn", "fmt_msg", "xid")
    writer.writeBatch(batch, 5L)
    def shard(): Map[String, Seq[Byte]] = {
      val d = Paths.get(s"$dir/sink")
      Files.list(d).iterator().asScala.toSeq
        .map(f => f.getFileName.toString -> Files.readAllBytes(f).toSeq)
        .toMap
    }
    val first = shard()
    assert(first.nonEmpty)
    assert(first.keySet.forall(_.startsWith("rec-000000005-L")),
      s"files must be (batch, lane, position)-keyed, got ${first.keySet}")
    writer.writeBatch(batch, 5L) // foreachBatch replay of the same epoch
    assert(shard() == first,
      "replaying batch 5 must leave every lane byte-identical")
  }

  test("lane routing is a pure function of the key (stable across batches)") {
    import spark.implicits._
    val dir = tmp()
    val client = new LocalFilePutClient(s"$dir/sink")
    val writer = new OrderedAggregatingWriter(client, maxAggBytes = 1 << 20,
      lanes = 4)
    val b1 = Seq((0L, "7:0", 7L)).toDF("lsn", "fmt_msg", "xid")
    val b2 = Seq((1L, "7:1", 7L)).toDF("lsn", "fmt_msg", "xid")
    writer.writeBatch(b1, 0L)
    writer.writeBatch(b2, 1L)
    val lanesUsed = Files.list(Paths.get(s"$dir/sink")).iterator().asScala
      .map(_.getFileName.toString.split("-")(2)).toSeq.distinct
    assert(lanesUsed.size == 1,
      s"key 7 must route to the same lane in every batch: $lanesUsed")
  }
}
