package graft.streaming

import java.nio.file.Path

/** Test bridge to the private[streaming] CommitLog. */
object CommitLogAccess {
  def read(path: Path, arity: Int): Seq[Seq[Long]] =
    CommitLog.read(path, arity)
  def append(path: Path, fields: Long*): Unit =
    CommitLog.append(path, fields: _*)
}
