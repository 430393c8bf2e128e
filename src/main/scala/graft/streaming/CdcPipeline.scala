package graft.streaming

import graft.functions.Cdc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's end-to-end dataflow (SURVEY.md §3.2) as one
  * Structured Streaming job:
  *
  *   cdc-file source (LSN offsets, commit→feedback, backpressure cap)
  *     → parseWal2Json (same column expressions as batch — P2/P4/F1/J1)
  *     → operation gate (F2, null-not-drop)
  *     → csvPayload (X2)
  *     → observe() running metrics (A3)
  *     → foreachBatch ordered KPL-style sink (A1/A2/K1)
  *
  * One micro-batch = one iteration of the reference's consume loop;
  * the checkpoint + source.commit() give the same at-least-once,
  * commit-ordered contract. The parse/filter/format stages are the
  * exact Column functions the batch queries use — written once, run
  * in both engines' modes.
  */
object CdcPipeline {

  /** Build the transformed (unsunk) streaming DataFrame. */
  def transform(spark: SparkSession, sourcePath: String,
      pkCatalog: DataFrame, operations: Seq[String],
      maxRecordsPerTrigger: Long = Long.MaxValue): DataFrame = {
    val raw = graft.sources.CdcSource.rawStream(spark, sourcePath,
      maxRecordsPerTrigger)
    val parsed = Cdc.parseWal2Json(raw, "payload", pkCatalog)
    parsed
      .withColumn("fmt_msg", Cdc.operationGate(col("operation"),
        Cdc.csvPayload(col("xid"), col("table_name"), col("operation"),
          col("pkey")), operations))
      // A3: running message/byte counters, surfaced per micro-batch in
      // StreamingQueryProgress.observedMetrics (the reference logs the
      // same two numbers every 10 s, __main__.py:106-115)
      .observe("cdc_metrics",
        count(lit(1)).as("msg_count"),
        sum(length(col("fmt_msg"))).as("msg_bytes"),
        // cur_xact = xid of the latest change in WAL order (see
        // GraftJob's observe note on max_by vs max)
        max_by(col("xid"), col("lsn")).as("last_xid"))
  }

  /** test_decoding mode: the BEGIN-xid carry (P3) must survive
    * micro-batch boundaries — a BEGIN can arrive in one trigger and
    * its row changes in the next, which no within-batch window can
    * see. flatMapGroupsWithState over the (single) slot key carries
    * cur_xact across batches; the single group matches the problem:
    * a replication slot is one totally ordered lane (the reference is
    * equally single-threaded). Rows are parsed with the same regex
    * semantics as Cdc.parseTestDecoding.
    */
  def transformTestDecoding(spark: SparkSession, sourcePath: String,
      maxRecordsPerTrigger: Long = Long.MaxValue,
      peek: Boolean = false)
      : org.apache.spark.sql.Dataset[(Long, Long, String, String, String)] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val raw = graft.sources.CdcSource.rawStream(spark, sourcePath,
      maxRecordsPerTrigger, peek)
      .select(col("lsn"), col("payload")).as[(Long, String)]
    val TableLine = "^table ([^:]+): (\\w+): (.*)$".r
    raw
      .groupByKey(_ => 0) // one slot == one ordered state lane
      .flatMapGroupsWithState[Long, (Long, Long, String, String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_, batch, state) => {
          var xid = state.getOption.getOrElse(-1L)
          val out = batch.toVector.sortBy(_._1).flatMap { case (lsn, p) =>
            if (p.startsWith("BEGIN ")) {
              xid = p.substring(6).trim.toLong
              None
            } else p match {
              case TableLine(table, op, body) =>
                Some((lsn, xid, table, op, body))
              case _ => None // COMMIT / noise
            }
          }
          state.update(xid)
          out.iterator
        })
  }

  /** Wire the full pipeline and start it. */
  def start(spark: SparkSession, sourcePath: String, pkCatalog: DataFrame,
      operations: Seq[String], sinkDir: String, checkpointDir: String,
      maxRecordsPerTrigger: Long = Long.MaxValue,
      trigger: Trigger = Trigger.ProcessingTime("13 seconds"),
      putClient: PutClient = null): StreamingQuery = {
    val client =
      if (putClient != null) putClient else new LocalFilePutClient(sinkDir)
    val writer = new OrderedAggregatingWriter(client)
    transform(spark, sourcePath, pkCatalog, operations, maxRecordsPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        writer.writeBatch(df, id)
      }
      .start()
  }
}
