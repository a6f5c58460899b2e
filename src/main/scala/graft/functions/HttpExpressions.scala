package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * HTTP response → body extraction with `Transfer-Encoding: chunked`
 * reassembly (RFC 9112 §7.1), for Common Crawl raw `response` records
 * (reference behavior: the crawl-ingest analog of SURVEY §2.14 item 41).
 *
 * Semantics:
 *  - no `\r\n\r\n` header separator → the payload passes through whole
 *    (already bare, or a header-only 304);
 *  - headers present, no `Transfer-Encoding: chunked` → everything after
 *    the FIRST separator (later CRLF pairs belong to the body);
 *  - chunked → the chunk-data spans concatenated: hex size line (chunk
 *    extensions after `;` ignored, case-insensitive hex), `size` BYTES of
 *    data, CRLF, repeating until the 0-size terminator; trailers dropped.
 *    A malformed walk (missing CRLF, non-hex size) falls back to the raw
 *    body rather than nulling the row — crawl data is adversarial and a
 *    filter stage downstream beats a lost record.
 *
 * Why an expression, not built-ins: the de-chunk walk is a data-dependent
 * loop (each chunk's length is read from the payload), which no
 * composition of substring/instr can express. Byte-exact: chunk sizes
 * count BYTES and the walk runs BEFORE any UTF-8 decode (the input is the
 * raw binary payload) — a multi-byte codepoint split mid-chunk has ASCII
 * framing bytes between its halves, so decode-then-dechunk would corrupt
 * it to U+FFFD; dechunk-then-decode reassembles it exactly.
 */
case class HttpBodyExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"http_body needs a binary or string column, got $dt")
  }

  override def nullSafeEval(input: Any): Any = input match {
    case b: Array[Byte] => HttpBodyExtract.compute(b)
    case u: UTF8String => HttpBodyExtract.compute(u.getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = HttpBodyExtract.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val arg = child.dataType match {
        case BinaryType => s"$s"
        case _ => s"$s.getBytes()"
      }
      s"${ev.value} = ($cls.compute($arg));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "http_body"
}

object HttpBodyExtract {

  def apply(payload: Column): Column =
    GraftShims.column(new HttpBodyExtract(GraftShims.expression(payload)))

  private val Sep = Array[Byte]('\r', '\n', '\r', '\n')

  /** Shared eval for interpreted and generated code paths. */
  def compute(bytes: Array[Byte]): UTF8String = {
    val sep = indexOf(bytes, Sep, 0)
    if (sep < 0) return UTF8String.fromBytes(bytes)
    val bodyStart = sep + 4
    if (isChunked(bytes, sep)) dechunk(bytes, bodyStart)
    else UTF8String.fromBytes(bytes, bodyStart, bytes.length - bodyStart)
  }

  /** Case-insensitive scan of the header block (ASCII per RFC) for a
   *  `Transfer-Encoding` header whose value mentions `chunked`. */
  private def isChunked(bytes: Array[Byte], headerEnd: Int): Boolean = {
    // headers are ASCII-cased; lower in place on a String copy of the block
    val headers = new String(bytes, 0, headerEnd,
      java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase(java.util.Locale.ROOT)
    var from = headers.indexOf("transfer-encoding:")
    while (from >= 0) {
      // header NAME must start a line (offset 0 is the status line, so a
      // match at 0 can't be a header — but be permissive: a proxy may strip
      // the status line)
      if (from == 0 || headers.charAt(from - 1) == '\n') {
        val lineEnd = headers.indexOf('\r', from) match {
          case -1 => headers.length
          case e => e
        }
        if (headers.substring(from + 18, lineEnd).contains("chunked")) return true
      }
      from = headers.indexOf("transfer-encoding:", from + 1)
    }
    false
  }

  private def dechunk(bytes: Array[Byte], bodyStart: Int): UTF8String = {
    val out = new java.io.ByteArrayOutputStream(
      math.max(16, bytes.length - bodyStart))
    var i = bodyStart
    while (i < bytes.length) {
      val lineEnd = indexOf(bytes, Array[Byte]('\r', '\n'), i)
      if (lineEnd < 0) return rawBody(bytes, bodyStart) // malformed: no size line
      var sizeEnd = lineEnd
      // drop chunk extensions: size [; ext-name [= ext-val]]*
      var j = i
      var semi = -1
      while (j < lineEnd && semi < 0) {
        if (bytes(j) == ';') semi = j
        j += 1
      }
      if (semi >= 0) sizeEnd = semi
      val size = parseHex(bytes, i, sizeEnd)
      if (size < 0) return rawBody(bytes, bodyStart) // malformed: non-hex size
      if (size == 0) {
        // terminator; trailers (if any) are dropped by construction
        return UTF8String.fromBytes(out.toByteArray)
      }
      val dataStart = lineEnd + 2
      if (dataStart + size > bytes.length) {
        // truncated record: keep what arrived (crawl truncation is routine)
        out.write(bytes, dataStart, math.max(0, bytes.length - dataStart))
        return UTF8String.fromBytes(out.toByteArray)
      }
      out.write(bytes, dataStart, size)
      i = dataStart + size + 2 // skip chunk data + its trailing CRLF
    }
    UTF8String.fromBytes(out.toByteArray) // missing 0-terminator: accept
  }

  private def rawBody(bytes: Array[Byte], bodyStart: Int): UTF8String =
    UTF8String.fromBytes(bytes, bodyStart, bytes.length - bodyStart)

  /** Hex parse of bytes[from,to) with surrounding ASCII whitespace allowed;
   *  -1 on empty/overflow/non-hex. */
  private def parseHex(bytes: Array[Byte], from: Int, to: Int): Int = {
    var i = from
    var end = to
    while (i < end && (bytes(i) == ' ' || bytes(i) == '\t')) i += 1
    while (end > i && (bytes(end - 1) == ' ' || bytes(end - 1) == '\t')) end -= 1
    if (i >= end) return -1
    var v = 0L
    while (i < end) {
      val c = bytes(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1
      v = v * 16 + d
      if (v > Int.MaxValue) return -1
      i += 1
    }
    v.toInt
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    val n = needle.length
    var i = math.max(0, from)
    val limit = hay.length - n
    while (i <= limit) {
      var j = 0
      while (j < n && hay(i + j) == needle(j)) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }
}
