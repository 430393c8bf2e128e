package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

/** Append-only commit log shared by the effectively-once sinks
  * ([[ShardedCorpusSink]], [[MaterializedTable]]): one fsync'd
  * `fields...` CSV line per committed epoch.
  *
  * Torn-write tolerance: a process killed mid-append can leave a
  * partial trailing line. Reads count only NEWLINE-TERMINATED lines
  * that parse as exactly `arity` longs (the newline is the record's
  * commit marker), and appends heal the file first — a non-terminated
  * tail gets a poisoning ",x" suffix before the newline, so a partial
  * "5" can neither concatenate with a replayed "5,3\n" into "55,3" nor
  * masquerade as a shorter valid record. Replay after a torn write
  * therefore self-repairs: the fragment is permanently unparseable, the
  * batch is re-applied, and the log ends well-formed.
  */
private[streaming] object CommitLog {

  def read(path: Path, arity: Int): Seq[Seq[Long]] =
    if (!Files.exists(path)) Seq.empty
    else {
      // Only NEWLINE-TERMINATED lines count as committed: a torn tail
      // cut mid-record ("12,3" truncated from "12,34\n") would parse as
      // a plausible-but-wrong record if the unterminated remainder were
      // considered — the newline is the record's commit marker.
      val s = new String(Files.readAllBytes(path),
        StandardCharsets.UTF_8)
      val term = s.lastIndexOf('\n')
      if (term < 0) Seq.empty
      else s.substring(0, term).split("\n", -1).toSeq.flatMap { l =>
        val parts = l.split(",", -1)
        if (parts.length != arity) None
        else try Some(parts.toSeq.map(_.trim.toLong))
        catch { case _: NumberFormatException => None }
      }
    }

  /** Atomically replace the log with `records` (retention compaction:
    * rewrite to the live tail). Write-temp + ATOMIC_MOVE, so a reader
    * or a crash sees either the old or the new file, never a torn
    * hybrid — and the torn-tail healing in [[append]]/[[read]] already
    * tolerates a log that was rewritten out from under a replayer. */
  def rewrite(path: Path, records: Seq[Seq[Long]]): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".compact.tmp")
    val body = records.map(_.mkString(",")).map(_ + "\n").mkString
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE, StandardOpenOption.SYNC)
    Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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
    // the heal marker POISONS the torn fragment rather than just
    // terminating it: a fragment like "12,3" (cut from "12,34\n") would
    // become a valid-looking line if only a newline were added; ",x"
    // appends a non-numeric field so the fragment can never parse as a
    // committed record at any arity
    val line = (if (needsHeal) ",x\n" else "") + fields.mkString(",") + "\n"
    Files.write(path, line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND,
      StandardOpenOption.SYNC)
  }
}
