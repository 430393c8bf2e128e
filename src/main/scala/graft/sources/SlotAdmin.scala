package graft.sources

import java.sql.SQLException

/** Replication-slot DDL (operator S3, reference slot.py:96-120):
  * idempotent create/drop, swallowing exactly the "already exists" /
  * "does not exist" SQLSTATEs the reference swallows via psycopg2
  * pgcodes (DUPLICATE_OBJECT 42710, UNDEFINED_OBJECT 42704).
  *
  * The statement runner is injected so the logic is testable without a
  * Postgres; the live path hands in a JDBC-connection executor. Used
  * by a production CDC source for the createSlot / recreateSlot
  * options (reference __main__.py:34-37, 56-60).
  */
class SlotAdmin(execute: String => Unit) {

  private val DuplicateObject = "42710"
  private val UndefinedObject = "42704"

  def createSlot(name: String, plugin: String = "wal2json"): Unit =
    try execute(
      s"SELECT pg_create_logical_replication_slot('$name', '$plugin')")
    catch {
      case e: SQLException if e.getSQLState == DuplicateObject => ()
    }

  def deleteSlot(name: String): Unit =
    try execute(s"SELECT pg_drop_replication_slot('$name')")
    catch {
      case e: SQLException if e.getSQLState == UndefinedObject => ()
    }

  /** --recreate-slot: drop-if-exists then create (fresh restart LSN). */
  def recreateSlot(name: String, plugin: String = "wal2json"): Unit = {
    deleteSlot(name)
    createSlot(name, plugin)
  }
}
