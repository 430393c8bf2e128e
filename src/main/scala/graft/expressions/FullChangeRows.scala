package graft.expressions

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ONE-parse full-change extraction: from a wal2json message, emit an
  * array of rows `(xid, schema, table, kind, change_py)` — one per
  * change element — where `change_py` is the element re-serialized by
  * the [[PyJson]] conventions (byte-identical to CPython json.dumps,
  * `oldkeys` and numeric tokens preserved verbatim).
  *
  * Exists for throughput: the composable formulation
  * (`json_array_length` + per-index `get_json_object` + field
  * extraction + `py_json`) re-parses the payload ~6x per change row;
  * this walks the Jackson token stream once per MESSAGE, capturing the
  * routing fields while rendering. Returns null (→ explode drops the
  * message) on malformed input, like `from_json`.
  */
case class FullChangeRows(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(FullChangeRows.rowType,
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"full_change_rows requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    try FullChangeRows.parse(input.asInstanceOf[UTF8String].toString)
    catch { case scala.util.control.NonFatal(_) => null }

  override protected def withNewChildInternal(
      newChild: Expression): FullChangeRows = copy(child = newChild)
}

object FullChangeRows {
  val rowType: StructType = StructType(Seq(
    StructField("xid", LongType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("kind", StringType),
    StructField("change_py", StringType)))

  private val factory = new JsonFactory()

  private[expressions] def parse(s: String): GenericArrayData = {
    val p = factory.createParser(s)
    try {
      if (p.nextToken() != JsonToken.START_OBJECT)
        throw new IllegalArgumentException("not an object")
      var xid: java.lang.Long = null
      val elems = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, String, String)] // schema, table, kind, py
      while (p.nextToken() != JsonToken.END_OBJECT) {
        p.currentName() match {
          case "xid" =>
            p.nextToken()
            if (p.currentToken() == JsonToken.VALUE_NUMBER_INT)
              xid = p.getLongValue
            else p.skipChildren()
          case "change" =>
            p.nextToken()
            if (p.currentToken() != JsonToken.START_ARRAY)
              throw new IllegalArgumentException("change is not an array")
            while (p.nextToken() != JsonToken.END_ARRAY) {
              if (p.currentToken() != JsonToken.START_OBJECT)
                throw new IllegalArgumentException("change element not object")
              var schema: String = null
              var table: String = null
              var kind: String = null
              val sb = new java.lang.StringBuilder(128)
              sb.append('{')
              var first = true
              while (p.nextToken() != JsonToken.END_OBJECT) {
                val name = p.currentName()
                if (!first) sb.append(", ")
                first = false
                PyJson.writeString(name, sb)
                sb.append(": ")
                p.nextToken()
                if (p.currentToken() == JsonToken.VALUE_STRING) name match {
                  case "schema" => schema = p.getText
                  case "table" => table = p.getText
                  case "kind" => kind = p.getText
                  case _ => ()
                }
                PyJson.writeValue(p, sb)
              }
              sb.append('}')
              elems += ((schema, table, kind, sb.toString))
            }
          case _ =>
            p.nextToken()
            p.skipChildren()
        }
      }
      val x = xid
      new GenericArrayData(elems.map { case (schema, table, kind, py) =>
        new GenericInternalRow(Array[Any](
          if (x == null) null else x.longValue(),
          if (schema == null) null else UTF8String.fromString(schema),
          if (table == null) null else UTF8String.fromString(table),
          if (kind == null) null else UTF8String.fromString(kind),
          UTF8String.fromString(py))): InternalRow
      }.toArray)
    } finally p.close()
  }

  def full_change_rows(c: Column): Column =
    Bridge.column(FullChangeRows(Bridge.expression(c)))
}
