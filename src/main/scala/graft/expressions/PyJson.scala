package graft.expressions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Re-serialize a JSON document byte-identically to CPython's
  * `json.dumps(json.loads(s))` with default arguments: separators
  * `', '` / `': '`, `ensure_ascii=True` (every char > 0x7e escaped as
  * \\uXXXX, non-BMP as surrogate pairs), object key order preserved
  * (Python dicts keep insertion order = parse order), and number
  * tokens copied verbatim from the input.
  *
  * This is what makes the full-change serializer (reference
  * formatter.py:158-163: `json.dumps(FullChange._asdict())`) byte-
  * faithful: the wal2json change element flows through as raw JSON
  * text — `oldkeys` and any future field survive, numbers are never
  * coerced to strings — and only the whitespace/escaping convention is
  * normalized to the reference's. Returns null on malformed input.
  *
  * Deliberate deviation: number tokens are preserved VERBATIM rather
  * than round-tripped through a float. CPython would re-render a
  * wal2json `numeric` like 1.50 as 1.5 (and corrupt numerics beyond
  * double precision entirely); copying the Postgres-rendered token is
  * byte-identical for integers and canonical floats and strictly more
  * faithful to the wire data everywhere else.
  *
  * Interpreted eval (CodegenFallback): one Jackson token walk per
  * message — the same work from_json does; codegen would only inline
  * the call.
  */
case class PyJson(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  // malformed input yields null even when the child is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"py_json requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    try UTF8String.fromString(
      PyJson.render(input.asInstanceOf[UTF8String].toString))
    catch { case scala.util.control.NonFatal(_) => null }

  override protected def withNewChildInternal(newChild: Expression): PyJson =
    copy(child = newChild)
}

object PyJson {
  private val factory = new JsonFactory()

  def render(s: String): String = {
    val p = factory.createParser(s)
    try {
      if (p.nextToken() == null) throw new IllegalArgumentException("empty")
      val sb = new java.lang.StringBuilder(s.length + 16)
      writeValue(p, sb)
      sb.toString
    } finally p.close()
  }

  private[expressions] def writeValue(
      p: JsonParser, sb: java.lang.StringBuilder): Unit =
    p.currentToken() match {
      case JsonToken.START_OBJECT =>
        sb.append('{')
        var first = true
        while (p.nextToken() != JsonToken.END_OBJECT) {
          if (!first) sb.append(", ")
          first = false
          writeString(p.currentName(), sb)
          sb.append(": ")
          p.nextToken()
          writeValue(p, sb)
        }
        sb.append('}')
      case JsonToken.START_ARRAY =>
        sb.append('[')
        var first = true
        while (p.nextToken() != JsonToken.END_ARRAY) {
          if (!first) sb.append(", ")
          first = false
          writeValue(p, sb)
        }
        sb.append(']')
      case JsonToken.VALUE_STRING => writeString(p.getText, sb)
      case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
        sb.append(p.getText) // verbatim token text: 1.0 stays 1.0
      case JsonToken.VALUE_TRUE => sb.append("true")
      case JsonToken.VALUE_FALSE => sb.append("false")
      case JsonToken.VALUE_NULL => sb.append("null")
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }

  /** CPython json (ensure_ascii=True) string escaping. */
  private[expressions] def writeString(
      s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ =>
          if (c < 0x20 || c > 0x7e) sb.append(f"\\u${c.toInt}%04x")
          else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  def py_json(c: Column): Column = Bridge.column(PyJson(Bridge.expression(c)))
}
