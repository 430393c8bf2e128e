package graft.core

import org.apache.spark.sql.types._

/** Core record types of the CDC dataflow, mirroring the reference's
  * namedtuples (SURVEY.md §1.2; reference formatter.py:12-17,
  * slot.py:14) as case classes / StructTypes.
  *
  * Deviation from the reference: `xid` is LongType end-to-end. The
  * reference keeps it a string in test_decoding mode and an int in
  * wal2json mode; a single numeric type is strictly more useful and
  * the formatters render it identically.
  */
case class Change(xid: Long, table: String, operation: String, pkey: String)

case class PrimaryKeyMapItem(
    table_name: String, col_name: String, col_type: String,
    col_ord_pos: Int)

object Model {
  /** Schema of one wal2json change element (reference formatter.py:89-101,
    * README.rst:107-117). Column values are read as strings to stay
    * type-agnostic, faithful to the reference's pass-through semantics.
    */
  val walChangeSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("columnnames", ArrayType(StringType)),
    StructField("columntypes", ArrayType(StringType)),
    StructField("columnvalues", ArrayType(StringType))))

  /** Top-level wal2json message: {"xid": n, "change": [...]} (with
    * include-xids; reference slot.py:124-125, formatter.py:106-110). */
  val walMessageSchema: StructType = StructType(Seq(
    StructField("xid", LongType),
    StructField("change", ArrayType(walChangeSchema))))

  val changeSchema: StructType = StructType(Seq(
    StructField("xid", LongType),
    StructField("table", StringType),
    StructField("operation", StringType),
    StructField("pkey", StringType)))
}
