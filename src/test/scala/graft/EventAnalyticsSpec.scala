package graft

import java.sql.Timestamp

import graft.streaming.EventAnalytics
import graft.streaming.EventAnalytics.{ClosedSession, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("watermarked window agg finalizes windows and drops late data") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventAnalytics
      .windowedCounts(in.toDF(), window = "10 minutes",
        watermark = "5 minutes")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Append).start()
    // window [10:00,10:10): two events
    in.addData(Event(1, ts(1), 1.0), Event(1, ts(2), 2.0))
    q.processAllAvailable()
    // advance watermark far past the first window => it finalizes
    in.addData(Event(1, ts(40), 3.0))
    q.processAllAvailable()
    // this event is behind the watermark => dropped
    in.addData(Event(1, ts(3), 99.0))
    q.processAllAvailable()
    in.addData(Event(1, ts(59), 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_agg").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    // 2, not 3: the 99.0 event arrived behind the watermark after the
    // window finalized and was dropped
    assert(rows("2024-01-01 10:00:00.0") == 2L,
      s"first window wrong or missing: $rows")
  }

  test("stream-static enrichment: broadcast dim join, unmatched events survive") {
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "GOLD"), (2L, "SILVER"))
      .toDF("dim_user_id", "segment")
    val in = MemoryStream[Event]
    val q = EventAnalytics
      .enrichAndRollup(in.toDF(), dim, window = "10 minutes",
        watermark = "5 minutes")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    // user 3 has no dim row — must come through as UNKNOWN, not drop
    in.addData(Event(1, ts(1), 10.0), Event(2, ts(2), 20.0),
      Event(1, ts(3), 5.0), Event(3, ts(4), 7.0))
    q.processAllAvailable()
    in.addData(Event(1, ts(40), 1.0)) // advance watermark, finalize
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enriched").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set(("GOLD", 2L, 15.0), ("SILVER", 1L, 20.0),
      ("UNKNOWN", 1L, 7.0)), s"got $rows")
  }

  test("windowed KMV distinct: sketch state merges across batches, exact below k") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventAnalytics
      .windowedDistinct(in.toDF(), window = "10 minutes",
        watermark = "5 minutes", k = 128)
      .writeStream.format("memory").queryName("kmv_win")
      .outputMode(OutputMode.Append).start()
    // window [10:00,10:10): users 1..4 arrive split across TWO
    // micro-batches (with a repeat), so the KMV buffer must survive a
    // state-store round-trip and merge with the second batch's partial
    in.addData(Event(1, ts(1), 1.0), Event(2, ts(2), 1.0),
      Event(1, ts(3), 1.0))
    q.processAllAvailable()
    in.addData(Event(3, ts(4), 1.0), Event(4, ts(5), 1.0),
      Event(2, ts(6), 1.0))
    q.processAllAvailable()
    // advance the watermark past the window => it finalizes and emits
    in.addData(Event(9, ts(40), 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("kmv_win").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
    assert(rows.length == 1, s"exactly one finalized window: ${rows.toSeq}")
    val (start, nEvents, est) = rows.head
    assert(start == "2024-01-01 10:00:00.0")
    assert(nEvents == 6L)
    // 4 distinct users < k=128 => the small-set branch is EXACT
    assert(est == 4.0, s"estimate $est != exact 4")
  }

  test("streaming heavy hitters: bounded sketch, exact counts across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[String]
    val q = EventAnalytics
      .heavyHitters(in.toDF().toDF("token"), capacity = 8, k = 5)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode(OutputMode.Complete).start()
    in.addData("a", "b", "a", "c")
    q.processAllAvailable()
    in.addData("a", "b", "d", "d", "d")
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("hh_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // complete mode: the table holds the latest emission — exact
    // counts over BOTH batches (distinct keys <= capacity => err 0),
    // ties broken (cnt DESC, token ASC)
    assert(rows.toSeq == Seq((1L, "a", 3L, 0L), (2L, "d", 3L, 0L),
      (3L, "b", 2L, 0L), (4L, "c", 1L, 0L)),
      s"got ${rows.toSeq}")
  }

  test("windowed top-k: each finalized window emits its own ranking once") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = EventAnalytics
      .windowedTopK(in.toDF().toDF("ts", "token"), win = "10 minutes",
        watermark = "5 minutes", capacity = 8, k = 3)
      .writeStream.format("memory").queryName("wtopk")
      .outputMode(OutputMode.Append).start()
    // window [10:00,10:10): x x y ; window stays open until watermark
    in.addData((ts(1), "x"), (ts(2), "x"), (ts(3), "y"))
    q.processAllAvailable()
    assert(spark.table("wtopk").count() == 0) // nothing finalized yet
    // advance the watermark far past the first window => it finalizes
    in.addData((ts(40), "z"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wtopk").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1),
        r.getString(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("2024-01-01 10:00:00.0", 1L, "x", 2L),
      ("2024-01-01 10:00:00.0", 2L, "y", 1L)),
      s"got ${rows.toSeq}")
  }

  test("streaming dedup emits each key once across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventAnalytics.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    in.addData(Event(1, ts(1), 1.0), Event(1, ts(1), 1.0))
    q.processAllAvailable()
    // same key again in a LATER batch, still inside the watermark
    in.addData(Event(1, ts(1), 1.0), Event(2, ts(2), 2.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_stream").count() == 2)
  }

  test("stream-stream interval join matches within the window only") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = EventAnalytics.intervalJoin(clicks.toDF(), buys.toDF())
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()
    clicks.addData(Event(1, ts(1), 1.0), Event(2, ts(1), 1.0))
    // user 1 buys 3 min after the click (inside the 5-min window);
    // user 2 buys 9 min after (outside)
    buys.addData(Event(1, ts(4), 10.0), Event(2, ts(10), 20.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
    assert(rows.toSeq == Seq((1L, 10.0)), s"got ${rows.toSeq}")
  }

  test("outer interval join emits unmatched rows only after watermark expiry") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = EventAnalytics.intervalJoinOuter(clicks.toDF(), buys.toDF())
      .writeStream.format("memory").queryName("ss_ojoin")
      .outputMode(OutputMode.Append).start()
    clicks.addData(Event(1, ts(1), 1.0), Event(2, ts(1), 2.0))
    // only user 1 converts inside the 5-min window
    buys.addData(Event(1, ts(4), 10.0))
    q.processAllAvailable()
    val early = spark.table("ss_ojoin").collect()
    // user 2's null row must NOT appear yet: its window is still open
    assert(!early.exists(r => r.getLong(0) == 2L),
      s"unmatched row emitted before watermark expiry: ${early.toSeq}")
    // advance both watermarks well past click+5min+10min watermark delay
    clicks.addData(Event(9, ts(40), 0.0))
    buys.addData(Event(9, ts(40), 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_ojoin").collect()
      .map(r => (r.getLong(0), Option(r.get(4))))
    assert(rows.contains((1L, Some(10.0))), s"got ${rows.toSeq}")
    assert(rows.contains((2L, None)),
      s"expected user 2's null-extended row after expiry: ${rows.toSeq}")
  }

  test("flatMapGroupsWithState sessionization: intra-batch and timeout closes") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventAnalytics.sessionize(in.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    // user 1: events at 10:01, 10:03 (one session), then 10:20 (gap
    // > 5min closes it intra-batch and opens another)
    in.addData(Event(1, ts(1), 1.0), Event(1, ts(3), 2.0))
    q.processAllAvailable()
    in.addData(Event(1, ts(20), 3.0))
    q.processAllAvailable()
    // advance the watermark far ahead so the open session times out
    in.addData(Event(2, ts(55), 9.0))
    q.processAllAvailable()
    in.addData(Event(2, ts(58), 9.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions").as[ClosedSession].collect()
      .filter(_.user_id == 1).sortBy(_.start_ms)
    assert(sessions.length == 2, s"expected 2 closed sessions: " +
      sessions.mkString(", "))
    assert(sessions(0).n_events == 2 && sessions(0).sum_value == 3.0)
    assert(sessions(0).start_ms == ts(1).getTime &&
      sessions(0).end_ms == ts(3).getTime)
    assert(sessions(1).n_events == 1 && sessions(1).sum_value == 3.0)
  }

  test("streaming transitions: chain survives batch boundaries, late events drop") {
    import graft.streaming.EventAnalytics.{Transition, TypedEvent}
    implicit val sq = spark.sqlContext
    val in = MemoryStream[TypedEvent]
    val q = EventAnalytics.transitions(in.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode(OutputMode.Append).start()
    // batch 1: view -> click for user 1; lone view for user 2
    in.addData(TypedEvent(1, ts(1), "view"), TypedEvent(1, ts(2), "click"),
      TypedEvent(2, ts(1), "view"))
    q.processAllAvailable()
    // batch 2: user 1 continues FROM STATE (click -> purchase); user 2's
    // late event (before the stored last) must not emit a transition
    in.addData(TypedEvent(1, ts(5), "purchase"),
      TypedEvent(2, ts(0), "click"))
    q.processAllAvailable()
    // batch 3: user 2 continues from the NON-rewritten last (view)
    in.addData(TypedEvent(2, ts(7), "purchase"))
    q.processAllAvailable()
    val got = spark.table("trans").as[Transition].collect()
      .map(t => (t.user_id, t.prev_type, t.event_type)).toSet
    q.stop()
    assert(got == Set(
      (1L, "view", "click"), (1L, "click", "purchase"),
      (2L, "view", "purchase")))
  }

  test("streaming CUSUM state across batches == batch q_cusum_online") {
    import graft.streaming.EventAnalytics.{CusumInput, CusumPoint}
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    // the same daily/reference lineage the ORACLE-CHECKED batch query
    // aggregates, materialized as the monitor's input rows
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("c"))
    val ref = daily.filter(col("day") < lit("2024-01-16"))
      .groupBy(col("event_type"))
      .agg(expr("sum(c) div count(1)").as("mu"))
    val feed = daily.filter(col("day") >= lit("2024-01-16"))
      .join(ref, Seq("event_type"))
      .select(col("event_type"), col("day").cast("string").as("day"),
        expr("c - mu - mu div 20").as("dev"), expr("mu div 2").as("h"))
      .as[CusumInput].collect().toSeq.sortBy(_.day)
    assert(feed.size >= 10, s"feed too small: ${feed.size}")

    val in = MemoryStream[CusumInput]
    val q = EventAnalytics.cusumMonitor(in.toDS())
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode(OutputMode.Append).start()
    // day-ordered batches: the upstream daily-window close guarantees
    // this ordering in deployment (see cusumMonitor scaladoc)
    feed.grouped((feed.size + 2) / 3).foreach { b =>
      in.addData(b); q.processAllAvailable()
    }
    val pts = spark.table("cusum_stream").as[CusumPoint].collect()
    q.stop()

    val streamed = pts.groupBy(_.event_type).map { case (k, ps) =>
      val alerts = ps.filter(_.alert)
      (k, ps.length.toLong, alerts.length.toLong,
        if (alerts.isEmpty) null else alerts.map(_.day).min,
        ps.map(_.s).max)
    }.toSet

    val batch = SparkEntry.queries("q_cusum_online")(spark, sf)
      .select(col("event_type"), col("n_monitor_days"),
        col("n_alert_days"), col("first_alert_day"), col("max_s"))
      .as[(String, Long, Long, String, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed == batch.map(t => (t._1, t._2, t._3, t._4, t._5)),
      s"streaming CUSUM $streamed != batch $batch")
  }
}
