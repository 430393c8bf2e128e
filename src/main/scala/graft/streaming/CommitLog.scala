package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

/** Append-only commit log shared by the effectively-once sinks
  * ([[ShardedCorpusSink]], [[MaterializedTable]]): one fsync'd
  * `fields...` CSV line per committed epoch.
  *
  * Torn-write tolerance: a process killed mid-append can leave a
  * partial trailing line. Reads drop any line that does not parse as
  * exactly `arity` longs, and appends heal the file first — if the last
  * byte is not a newline, one is inserted before the new record, so a
  * partial "5" can never concatenate with a replayed "5,3\n" into a
  * silently-corrupt "55,3". Replay after a torn write therefore
  * self-repairs: the partial line is ignored, the batch is re-applied,
  * and the log ends well-formed.
  */
private[streaming] object CommitLog {

  def read(path: Path, arity: Int): Seq[Seq[Long]] =
    if (!Files.exists(path)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(path).asScala.toSeq.flatMap { l =>
        val parts = l.split(",", -1)
        if (parts.length != arity) None
        else try Some(parts.toSeq.map(_.trim.toLong))
        catch { case _: NumberFormatException => None }
      }
    }

  def append(path: Path, fields: Long*): Unit = {
    Files.createDirectories(path.getParent)
    val needsHeal = Files.exists(path) && Files.size(path) > 0 && {
      val ch = Files.newByteChannel(path, StandardOpenOption.READ)
      try {
        ch.position(ch.size() - 1)
        val b = java.nio.ByteBuffer.allocate(1)
        ch.read(b)
        b.get(0) != '\n'.toByte
      } finally ch.close()
    }
    val line = (if (needsHeal) "\n" else "") + fields.mkString(",") + "\n"
    Files.write(path, line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND,
      StandardOpenOption.SYNC)
  }
}
