package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQueryListener

/** The reference's 10 s progress cadence (reference __main__.py:96-115
  * and log.py) as a pure, clock-injected accumulator:
  *
  *   - every consumed change ticks the window AND cumulative
  *     message/byte counters (raw payload bytes — psycopg2's
  *     `change.data_size` — NOT formatted output bytes, and counted
  *     before any operation gating, exactly like Consume.__call__),
  *   - a line is emitted once per crossed 10 s boundary: the
  *     reference's gate (`not int_time % 10 and int_time !=
  *     self.cur_window`) is evaluated per consumed MESSAGE, so a
  *     flowing stream observably logs once whenever a boundary
  *     passes; this port evaluates once per micro-batch completion,
  *     so the faithful translation is "has a new boundary passed
  *     since the last emission" — gating on `t % 10 == 0` here would
  *     fire on only the ~1-in-10 batches whose completion lands
  *     exactly on a boundary (a 13 s trigger would log every ~130 s),
  *   - emission resets the window counters, never the cumulative ones,
  *   - the xid field reports the latest transaction id seen by the
  *     parser (the reference's `formatter.cur_xact`).
  *
  * Field order and labels match the reference's format string
  * ('xid: {:12} win_count:{:>10} win_size:{:>10}mb cum_count:{:>10}
  * cum_size:{:>10}mb', sizes divided by 1048576). Float RENDERING is
  * JVM fixed-precision where CPython prints shortest-repr — semantic
  * parity, not byte parity, which is the right trade for a log line.
  */
class ProgressWindow(
    now: () => Long = () => System.currentTimeMillis() / 1000)
    extends Serializable {
  private var cumCount = 0L
  private var cumSize = 0L
  private var winCount = 0L
  private var winSize = 0L
  // -1 = unset: initialized lazily to the FIRST record()'s boundary so
  // that first call never emits (the reference sets cur_window from the
  // first consumed message's clock — it never logs at startup, and the
  // first window spans a real 10 s, not a single batch).
  private var curWindow = -1L
  private var lastXid = 0L

  /** Fold one micro-batch's observed metrics in; returns the progress
    * line when the 10 s gate opens. */
  def record(xid: Long, msgCount: Long, msgBytes: Long): Option[String] =
    synchronized {
      cumCount += msgCount
      cumSize += msgBytes
      winCount += msgCount
      winSize += msgBytes
      if (xid > 0) lastXid = xid
      val t = now()
      val boundary = t / 10 * 10 // latest 10 s boundary at or before t
      if (curWindow < 0) {
        curWindow = boundary // first batch anchors the window; no line
        None
      } else if (boundary > curWindow) {
        val line = f"xid: $lastXid%12d win_count:$winCount%10d " +
          f"win_size:${winSize / 1048576.0}%10.4fmb " +
          f"cum_count:$cumCount%10d cum_size:${cumSize / 1048576.0}%10.4fmb"
        curWindow = boundary
        winCount = 0L
        winSize = 0L
        Some(line)
      } else None
    }
}

/** Query-listener adapter: feeds each micro-batch's observed metrics
  * (`cdc_raw_metrics` counts/bytes from the raw source scan,
  * `cdc_metrics.last_xid` from the parse stage) into a
  * [[ProgressWindow]] and hands emitted lines to `log` — the Spark
  * seat of the reference's `logger.info(progress_msg...)`.
  * Registered by graft.Main (`spark.streams.addListener`); library
  * users opt in per session. */
class CdcProgressListener(log: String => Unit,
    window: ProgressWindow = new ProgressWindow())
    extends StreamingQueryListener {
  import StreamingQueryListener._

  private def metric(row: Row, name: String): Long =
    if (row == null || !row.schema.fieldNames.contains(name)) 0L
    else {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) 0L else row.getLong(i)
    }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val m = event.progress.observedMetrics
    val raw = m.get("cdc_raw_metrics")
    if (raw != null) {
      window.record(metric(m.get("cdc_metrics"), "last_xid"),
        metric(raw, "msg_count"), metric(raw, "msg_bytes")).foreach(log)
    }
  }
}
