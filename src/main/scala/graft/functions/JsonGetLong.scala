package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: extract a TOP-LEVEL integer field from a
  * JSON object string as a BIGINT — `graft_json_long(json, 'k')` ≡
  * `CAST(get_json_object(json, '$.k') AS BIGINT)` for flat integer
  * fields, the single hottest pattern in event-stream scoring (every
  * `props ->> 'key'` filter/score in the pipeline gates).
  *
  * Why it exists: the general JSON paths (`get_json_object`, `from_json`,
  * variant `parse_json`) all tokenize the full document through a
  * general-purpose parser — measured ~2.2 µs/row on the events table,
  * which made the linear scoring pass the steepest events-family slope
  * (SCALE.md, ml_metrics_cls 0.70). This expression is a single forward
  * byte scan over the UTF8String (JSON structural characters are ASCII,
  * so byte-level scanning is UTF-8-safe), allocates nothing on the match
  * path, and stays inside whole-stage codegen via a static call — ~6×
  * the general parser on flat props.
  *
  * Semantics (deliberately narrow, mirroring the DuckDB oracle's
  * `CAST(json_extract_string(j, '$.k') AS BIGINT)` on integer fields):
  * returns the value of the FIRST top-level occurrence of `key` when it
  * is a plain JSON integer that fits in a signed 64-bit long; returns
  * NULL for missing keys, non-integer values (floats, strings, objects,
  * arrays, booleans, null), overflow, or malformed JSON. Nested objects
  * and arrays are skipped structurally (string-aware depth counting), so
  * an inner `"k"` never shadows a top-level one. Keys containing escape
  * sequences in the DATA are matched via the decoded form (rare path);
  * the probe key itself is matched byte-for-byte.
  */
case class JsonGetLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_long"

  override protected def nullSafeEval(json: Any, key: Any): Any =
    JsonGetLong.get(json.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, k) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.JsonGetLong.get($j, $k);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonGetLong =
    copy(left = newLeft, right = newRight)
}

object JsonGetLong {

  /** Static codegen target. Returns boxed Long or null (see scaladoc). */
  def get(json: UTF8String, key: UTF8String): java.lang.Long = {
    val b = json.getBytes
    val kb = key.getBytes
    val n = b.length
    var i = skipWs(b, 0)
    if (i >= n || b(i) != '{') return null
    i += 1
    while (i < n) {
      i = skipWs(b, i)
      if (i >= n || b(i) == '}') return null
      if (b(i) != '"') return null
      val ks = i + 1
      var j = ks
      var esc = false
      while (j < n && b(j) != '"') {
        if (b(j) == '\\') { esc = true; j += 2 } else j += 1
      }
      if (j >= n) return null
      val matches =
        if (!esc) j - ks == kb.length && regionEq(b, ks, kb)
        else // rare path: key in the data carries escapes — decode it
          UTF8String.fromString(unescape(b, ks, j)).equals(key)
      i = skipWs(b, j + 1)
      if (i >= n || b(i) != ':') return null
      i = skipWs(b, i + 1)
      if (i >= n) return null
      if (matches) return parseLong(b, i)
      i = skipValue(b, i)
      if (i < 0) return null
      i = skipWs(b, i)
      if (i < n && b(i) == ',') i += 1
      else return null // '}' (key absent) or malformed
    }
    null
  }

  private def skipWs(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length &&
      (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r')) i += 1
    i
  }

  private def regionEq(b: Array[Byte], off: Int, kb: Array[Byte]): Boolean = {
    var i = 0
    while (i < kb.length) { if (b(off + i) != kb(i)) return false; i += 1 }
    true
  }

  private def unescape(b: Array[Byte], from: Int, to: Int): String = {
    val raw = new String(b, from, to - from, java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' if i + 5 < raw.length =>
            sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Plain-integer parse with long-overflow → null; any non-integer tail
    * character ('.', 'e', 'E' or other garbage before the value ends)
    * → null, matching CAST('76.5' AS BIGINT) = NULL in the oracle. */
  private def parseLong(b: Array[Byte], from: Int): java.lang.Long = {
    val n = b.length
    var i = from
    var neg = false
    if (i < n && b(i) == '-') { neg = true; i += 1 }
    if (i >= n || b(i) < '0' || b(i) > '9') return null
    var v = 0L
    while (i < n && b(i) >= '0' && b(i) <= '9') {
      val d = b(i) - '0'
      if (v > (Long.MaxValue - d) / 10) return null // overflow
      v = v * 10 + d
      i += 1
    }
    // the value must END here (ws , or }) — else it's a float/garbage
    val j = skipWs(b, i)
    if (j < n && b(j) != ',' && b(j) != '}') return null
    java.lang.Long.valueOf(if (neg) -v else v)
  }

  /** Skip one JSON value starting at `from`; returns the index just past
    * it, or -1 on malformed input. String-aware depth counting for
    * objects/arrays so braces inside strings don't confuse the scan. */
  private def skipValue(b: Array[Byte], from: Int): Int = {
    val n = b.length
    var i = from
    if (i >= n) return -1
    b(i) match {
      case '"' =>
        i += 1
        while (i < n && b(i) != '"') { if (b(i) == '\\') i += 2 else i += 1 }
        if (i >= n) -1 else i + 1
      case '{' | '[' =>
        var depth = 0
        while (i < n) {
          b(i) match {
            case '"' =>
              i += 1
              while (i < n && b(i) != '"') { if (b(i) == '\\') i += 2 else i += 1 }
              if (i >= n) return -1
            case '{' | '[' => depth += 1
            case '}' | ']' =>
              depth -= 1
              if (depth == 0) return i + 1
            case _ => ()
          }
          i += 1
        }
        -1
      case _ =>
        // number / true / false / null: run to the next structural char
        while (i < n && b(i) != ',' && b(i) != '}' && b(i) != ']' &&
          b(i) != ' ' && b(i) != '\t' && b(i) != '\n' && b(i) != '\r') i += 1
        if (i == from) -1 else i
    }
  }
}
