package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** "cdc-file": a DataSourceV2 MicroBatchStream with the exact contract
  * of the reference's replication-slot source (S1/K2/K3, SURVEY.md
  * §2.1), backed by a tailed text file instead of a walsender socket:
  *
  *  - one payload line per WAL message; the line number IS the LSN
  *    (a totally ordered, ever-growing position — same algebra as a
  *    Postgres LSN),
  *  - offsets are LSN ranges; Structured Streaming's checkpoint plays
  *    the role of the client-side restart position,
  *  - `commit(end)` — invoked by the engine only after the epoch is
  *    durably committed — appends the LSN to a `.feedback` file: the
  *    analog of `send_feedback(flush_lsn=...)` (reference
  *    __main__.py:101-104). Crash before commit ⇒ replay ⇒ the same
  *    at-least-once contract (reference README.rst:15-18),
  *  - `maxRecordsPerTrigger` caps each micro-batch (K3 backpressure:
  *    unread lines simply stay in the file, as unread WAL stays in
  *    the slot).
  *
  * A production Postgres source swaps the file tail for a replication
  * connection and keeps every interface here; nothing downstream
  * changes.
  */
class CdcFileSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcFileSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcFileTable(properties.get("path"),
      Option(properties.get("maxRecordsPerTrigger")).map(_.toLong)
        .getOrElse(Long.MaxValue),
      Option(properties.get("peek")).exists(_.toBoolean))
  override def supportsExternalMetadata(): Boolean = true
}

object CdcFileSource {
  /** payload + lsn + data_size, mirroring psycopg2's ReplicationMessage
    * envelope (payload, data_start, data_size). */
  val Schema: StructType = StructType(Seq(
    StructField("payload", StringType, nullable = false),
    StructField("lsn", LongType, nullable = false),
    StructField("data_size", LongType, nullable = false)))

  /** Line count without materializing contents — the admission side
    * reads this every trigger, so it must stay O(file bytes) scanned
    * but O(1) held (readAllLines per trigger on an ever-growing WAL
    * file trends quadratic in total work AND holds the whole file). */
  def lineCount(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return 0L
    val s = Files.lines(p, StandardCharsets.UTF_8)
    try s.count() finally s.close()
  }

  /** Stream lines [start, end) without materializing the prefix. */
  def lineRange(path: String, start: Long, end: Long)
      : (Iterator[String], AutoCloseable) = {
    val p = Paths.get(path)
    if (!Files.exists(p) || end <= start)
      return (Iterator.empty, () => ())
    val s = Files.lines(p, StandardCharsets.UTF_8)
      .skip(start).limit(end - start)
    (s.iterator().asScala, s)
  }
}

class CdcFileTable(path: String, maxPerTrigger: Long,
    peek: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"cdc-file($path)"
  override def schema(): StructType = CdcFileSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = CdcFileSource.Schema
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream =
        new CdcFileMicroBatchStream(path, maxPerTrigger, peek)
    }
}

case class LsnOffset(lsn: Long) extends Offset {
  override def json(): String = s"""{"lsn":$lsn}"""
}

class CdcFileMicroBatchStream(path: String, maxPerTrigger: Long,
    peek: Boolean = false)
    extends MicroBatchStream {
  // Tracks the last offset this stream has *planned*, so each trigger
  // admits at most maxPerTrigger new lines even while the file grows.
  private var lastPlanned: Long = -1L
  // Highest offset restored from the checkpoint log (deserializeOffset
  // runs during recovery): the engine has durably planned/committed up
  // to here, so the WAL head may NEVER be below it — see guardRegression.
  private var restoredFloor: Long = 0L

  /** Fail-fast on WAL regression (slot recreated / WAL file replaced
    * under a live checkpoint). Without this the source would sit on
    * empty batches until the NEW WAL grows past the old offset and
    * then silently skip its first `floor` records — data loss wearing
    * a clean progress log. The reference has the same failure mode
    * (a recreated slot restarts at a fresh restart_lsn and its
    * checkpointless client just follows); with a durable checkpoint
    * the only safe move is to halt and make the operator choose:
    * fresh checkpoint, or stop recreating slots under running jobs. */
  private def guardRegression(head: Long, floor: Long): Unit =
    if (head < floor) throw new IllegalStateException(
      s"WAL position regressed: head=$head < checkpointed/planned=" +
        s"$floor for $path — the slot/WAL was dropped or recreated " +
        "while this checkpoint exists. Restart with a FRESH checkpoint " +
        "to consume the recreated slot from its new origin.")

  override def initialOffset(): Offset = LsnOffset(0L)

  override def latestOffset(): Offset = {
    val total = CdcFileSource.lineCount(path)
    val base = if (lastPlanned < 0) 0L else lastPlanned
    guardRegression(total, math.max(base, restoredFloor))
    // saturating add: base + Long.MaxValue must not wrap negative, or
    // the offset oscillates and the engine schedules empty batches
    // forever (processAllAvailable never converges)
    val admitted =
      if (maxPerTrigger > total - base) total else base + maxPerTrigger
    lastPlanned = math.max(base, admitted)
    LsnOffset(lastPlanned)
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LsnOffset].lsn
    val e = end.asInstanceOf[LsnOffset].lsn
    // Restart-replan of a planned-but-uncommitted batch (e beyond
    // anything THIS stream instance planned): the WAL must still hold
    // every line of it. Checked ONLY on that path — in steady state
    // latestOffset just guarded against the same head, and lineCount
    // is an O(file-bytes) scan this source must not pay twice per
    // trigger.
    if (e > lastPlanned) {
      guardRegression(CdcFileSource.lineCount(path), e)
      lastPlanned = e // keep the admission tracker consistent
    }
    Array(CdcFilePartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcFileReaderFactory

  /** The 2-phase-commit ack: only after the engine has durably
    * committed the epoch does the slot learn it may discard WAL.
    * Note the engine invokes this while constructing the NEXT batch,
    * so feedback trails the sink by one epoch — a conservative lag
    * that can only cause replay, never loss (at-least-once preserved,
    * same contract as the reference's post-put send_feedback). */
  override def commit(end: Offset): Unit = {
    val lsn = end.asInstanceOf[LsnOffset].lsn
    // peek mode (pg_logical_slot_peek_changes parity): consume without
    // acking — the slot's restart pointer never advances, so a later
    // real run replays everything from the same position
    if (peek) { PgReplicationSource.logPeeked(lsn); return }
    Files.write(Paths.get(path + ".feedback"),
      s"$lsn\n".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    // reference __main__.py:103-104: every feedback ack logs its LSN
    PgReplicationSource.logFlushed(lsn)
  }

  override def deserializeOffset(json: String): Offset = {
    val lsn = json.replaceAll("[^0-9]", "").toLong
    // recovery path: remember the checkpoint's horizon for the
    // regression guard
    if (lsn > restoredFloor) restoredFloor = lsn
    LsnOffset(lsn)
  }

  override def stop(): Unit = ()
}

case class CdcFilePartition(path: String, start: Long, end: Long)
    extends InputPartition

class CdcFileReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcFilePartition]
    val (it, handle) = CdcFileSource.lineRange(p.path, p.start, p.end)
    new PartitionReader[InternalRow] {
      private var lsn = p.start - 1
      private var payload: String = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        payload = it.next(); lsn += 1; true
      }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(payload), lsn,
          payload.getBytes(StandardCharsets.UTF_8).length.toLong))
      override def close(): Unit = handle.close()
    }
  }
}
