package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over event streams — the watermark/stateful
  * surface of the SURVEY §2.1 checklist that the reference lacks but
  * BASELINE.json obliges:
  *
  *  - watermarked tumbling-window aggregation (late data dropped past
  *    the watermark, state bounded — the only viable shape for
  *    unbounded streams at scale),
  *  - custom session state via flatMapGroupsWithState: per-key state
  *    is O(open sessions), closed sessions emit exactly once on
  *    event-time timeout. This is the template for any
  *    custom-windowing/state machine the built-in operators can't
  *    express.
  *
  * Both compose with any source (the cdc-file source, Kafka, ...) and
  * any sink; specs drive them through MemoryStream with controlled
  * watermark advancement.
  */
object EventAnalytics {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)
  case class LastEvent(event_type: String, ts_ms: Long)
  case class Transition(user_id: Long, prev_type: String,
      event_type: String, ts_ms: Long)
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, sum_value: Double)

  /** Tumbling event-time window counts with a watermark bound. */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n"),
        col("sum_value"))

  /** Stream-static enrichment: the workhorse pattern for joining a
    * stream against a slowly-changing dimension snapshot — Spark
    * replans the static side per micro-batch, so a broadcast hint
    * keeps every batch a map-side hash join (no stream shuffle, no
    * state store: unlike stream-stream joins this is stateless).
    * Unmatched events keep flowing with a null segment (left join) —
    * dropping them silently is how pipelines lose late-registered
    * users. Aggregated per (window, segment) under a watermark.
    * At 100 TB-of-stream the static side is whatever fits broadcast
    * (dimension tables by definition); a fact-sized static side
    * would drop the hint and let AQE shuffle — same code path.
    * For dimensions that CHANGE mid-stream, MaterializedTable.enrich
    * is the CDC-maintained variant of this join. */
  def enrichAndRollup(events: DataFrame, dim: DataFrame,
      window: String = "1 hour", watermark: String = "10 minutes")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim), events("user_id") === dim("dim_user_id"),
        "left_outer")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        coalesce(col("segment"), lit("UNKNOWN")).as("segment"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("segment"),
        col("n"), col("sum_value"))

  /** Windowed distinct users via the bounded KMV sketch — the
    * streaming face of q_kmv_distinct. A streaming
    * `approx_count_distinct`-class aggregate must hold O(k) state per
    * window in the state store no matter how many distinct users the
    * window sees, and must merge correctly across micro-batches and
    * shuffle partitions; KmvSmallest's TypedImperativeAggregate
    * buffer gives exactly that (k smallest distinct hashes commute
    * with any batch/partition split — the same proof NativeExprSpec
    * pins for batch). Below k distinct the estimate is EXACT (the
    * sketch holds the whole hash set), which the spec asserts
    * against a batch countDistinct on the same feed. */
  def windowedDistinct(events: DataFrame, window: String = "1 hour",
      watermark: String = "10 minutes", k: Int = 128): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10)" +
          " as double) / 4294967296.0"))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(graft.expressions.KmvSmallest.kmv_smallest(col("h"), k).as("hs"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"),
        when(size(col("hs")) >= k,
          lit((k - 1).toDouble) / element_at(col("hs"), k))
          .otherwise(size(col("hs")).cast("double"))
          .as("distinct_users_est"))

  /** Streaming heavy hitters: the bounded SpaceSaving summary as a
    * streaming aggregate — O(capacity) state for the WHOLE stream
    * regardless of distinct-key cardinality, where a plain
    * groupBy(key).count() grows state with every key ever seen. Runs
    * in complete mode (the summary is one row, re-emitted per batch).
    * Correctness under micro-batching rides the sketch's mergeability
    * (SpaceSavingTopK.merge charges absent-key bounds), and while
    * distinct keys stay <= capacity the streaming counts are EXACT
    * across any batch/partition split — spec-asserted against the
    * batch groupBy. */
  def heavyHitters(tokens: DataFrame, tokenCol: String = "token",
      capacity: Int = 64, k: Int = 10): DataFrame =
    tokens
      .agg(graft.expressions.SpaceSavingTopK
        .space_saving_topk(col(tokenCol), capacity).as("hh"))
      .select(posexplode(col("hh")).as(Seq("pos", "e")))
      .filter(col("pos") < k)
      .select((col("pos") + 1).cast("long").as("rank"),
        col("e.token").as("token"), col("e.cnt").as("cnt"),
        col("e.err").as("err"))

  /** Per-window streaming top-k: the SpaceSaving sketch nested INSIDE
    * a watermarked event-time window — each finalized window emits its
    * own top-k once (append mode), which a global complete-mode
    * summary cannot express. State is O(open windows × capacity):
    * the trending-terms report shape, with the window close doing the
    * "emit exactly once" work and the sketch bounding per-window
    * state. */
  def windowedTopK(tokens: DataFrame, win: String = "10 minutes",
      watermark: String = "5 minutes", capacity: Int = 64,
      k: Int = 5): DataFrame =
    tokens
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), win))
      .agg(graft.expressions.SpaceSavingTopK
        .space_saving_topk(col("token"), capacity).as("hh"))
      .select(col("window.start").as("window_start"),
        posexplode(col("hh")).as(Seq("pos", "e")))
      .filter(col("pos") < k)
      .select(col("window_start"), (col("pos") + 1).cast("long").as("rank"),
        col("e.token").as("token"), col("e.cnt").as("cnt"))

  /** Streaming exact dedup: one row per key, with the watermark
    * bounding how long keys are remembered — the only way dedup state
    * stays finite on an unbounded stream. */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes")
      : DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("user_id", "ts")

  /** Stream-stream inner join with a time-interval condition: each
    * side's state is purged once the watermark passes the interval
    * bound. The classic enrichment shape (clicks ⋈ purchases within
    * an attribution window). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("l_ts"),
        col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    l.join(r, col("user_id") === col("r_user") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") <= col("l_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("user_id"), col("l_ts"), col("r_ts"),
        col("l_value"), col("r_value"))
  }

  /** Left-outer stream-stream interval join: like intervalJoin, but a
    * click with no purchase inside the attribution window still emits
    * (with nulled right columns) — ONLY once the watermark passes the
    * window bound, because until then a match could still arrive. The
    * interval condition on both event-time columns is what makes the
    * outer side's state finite: Spark can prove when an unmatched left
    * row is safe to emit and evict. An outer join without such a
    * condition would hold left state forever (and never emit nulls) —
    * the unbounded-state trap this module exists to document. */
  def intervalJoinOuter(left: DataFrame, right: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("l_ts"),
        col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    l.join(r, col("user_id") === col("r_user") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") <= col("l_ts") + expr("INTERVAL 5 MINUTES"),
      "left_outer")
      .select(col("user_id"), col("l_ts"), col("r_ts"),
        col("l_value"), col("r_value"))
  }

  /** Streaming face of the batch q_event_transitions operator: emit
    * one (prev_type → event_type) row per consecutive pair of a
    * user's events, with keyed state carrying the LAST event across
    * micro-batch boundaries so the chain never breaks at a batch
    * edge. Within a batch, events order by (ts, event_type) — the
    * same deterministic tiebreak as the batch window. An event older
    * than the stored last is DROPPED (it would retroactively rewrite
    * an already-emitted transition; a pipeline that must absorb such
    * lateness re-derives the matrix in batch where full ordering is
    * available). State is one (type, ts) pair per user — O(users),
    * the same bound as any per-user keyed operator here. */
  def transitions(events: Dataset[TypedEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, batch: Iterator[TypedEvent],
            state: GroupState[LastEvent]) => {
          val sorted = batch.toVector
            .sortBy(e => (e.ts.getTime, e.event_type))
          var prev = state.getOption
          val out = sorted.flatMap { e =>
            val t = e.ts.getTime
            prev match {
              case Some(p) if t < p.ts_ms => None // late: see scaladoc
              case p =>
                val r = p.map(l => Transition(uid, l.event_type,
                  e.event_type, t))
                prev = Some(LastEvent(e.event_type, t))
                r
            }
          }
          prev.foreach(state.update)
          out.iterator
        })
  }

  case class CusumInput(event_type: String, day: String, dev: Long,
      h: Long)
  case class CusumPoint(event_type: String, day: String, s: Long,
      alert: Boolean)

  /** Streaming face of the batch q_cusum_online monitor: the literal
    * one-sided CUSUM recursion S = max(0, S + dev), alert when S > h,
    * carried as one Long of keyed state per series across micro-batch
    * boundaries. Input rows are the per-day deviations an upstream
    * watermarked daily rollup (joined against the broadcast reference
    * means) emits — this operator only owns the recursion. Within a
    * batch rows order by day; like transitions/Scd2History the
    * cross-batch contract is event-time-ordered arrival, which the
    * upstream window close guarantees (a day finalizes before the
    * next day's row can exist). State is O(series), the minimum any
    * online changepoint monitor can hold. Parity vs the window-
    * identity batch form is pinned in EventAnalyticsSpec. */
  def cusumMonitor(rows: Dataset[CusumInput]): Dataset[CusumPoint] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Long, CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, batch: Iterator[CusumInput],
            state: GroupState[Long]) => {
          var s = state.getOption.getOrElse(0L)
          val out = batch.toVector.sortBy(_.day).map { r =>
            s = math.max(0L, s + r.dev)
            CusumPoint(key, r.day, s, s > r.h)
          }
          state.update(s)
          out.iterator
        })
  }

  /** Gap-based sessionization with custom state. Sessions close either
    * intra-batch (a gap observed between consecutive events) or by
    * event-time timeout once the watermark passes last + gap. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, batch: Iterator[Event],
            state: GroupState[SessionState]) => {
          if (batch.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              ClosedSession(uid, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = batch.toVector.sortBy(_.ts.getTime)
            var closed = Vector.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > gapMs =>
                  closed :+= ClosedSession(uid, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.sum + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.iterator
          }
        })
  }
}
