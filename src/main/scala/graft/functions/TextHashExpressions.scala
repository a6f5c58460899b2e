package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `ngram_md5_hashes(text, n, hexLen)` — the md5-prefix hash of every
 * n-token window of a whitespace-tokenized string, as `array<string>` of
 * lowercase hex prefixes.
 *
 * Exactly equivalent to
 * `transform(sequence(1, size(toks)-n+1), i -> substring(md5(array_join(slice(toks, i, n), " ")), 1, hexLen))`
 * (the [[graft.operators.Decontaminate]] key), but one pass over the UTF-8
 * bytes with zero per-window allocations: word boundaries are single 0x20
 * bytes (safe in UTF-8 — continuation bytes never equal 0x20), and the
 * window's joined-with-single-space form IS the original byte span between
 * word i's start and word i+n-1's end, so the digest runs straight over
 * the input buffer. One `MessageDigest` per thread, reset per window.
 *
 * md5 (not xxhash) because the value is an ENGINE-PORTABLE key: any system
 * with md5 — including the DuckDB battery oracle — recomputes the
 * identical hex, which is what makes cross-engine decontamination joins
 * and their correctness checks possible. Fewer than `n` tokens → empty
 * array (a short document has no complete window).
 */
case class NgramMd5Hashes(child: Expression, n: Int, hexLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 2 && hexLen >= 1 && hexLen <= 32 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(
        s"need n >= 2 and 1 <= hexLen <= 32, got ($n, $hexLen)")
    case dt =>
      TypeCheckResult.TypeCheckFailure(s"ngram_md5_hashes needs string input, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    NgramMd5Hashes.compute(input.asInstanceOf[UTF8String], n, hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NgramMd5Hashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a, $n, $hexLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_md5_hashes"
}

object NgramMd5Hashes {
  def apply(text: Column, n: Int, hexLen: Int = 16): Column =
    GraftShims.column(new NgramMd5Hashes(GraftShims.expression(text), n, hexLen))

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  def compute(text: UTF8String, n: Int, hexLen: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var numWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') numWords += 1; i += 1 }
    if (numWords < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](numWords + 1)
    var w = 1
    i = 0
    while (i < len) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(numWords) = len + 1 // sentinel: word k ends at starts(k+1)-1

    val md = digests.get()
    val numGrams = numWords - n + 1
    val out = new Array[Any](numGrams)
    val hexBytes = (hexLen + 1) / 2
    var g = 0
    while (g < numGrams) {
      val from = starts(g)
      val until = starts(g + n) - 1
      md.reset()
      md.update(bytes, from, until - from)
      val digest = md.digest()
      val hex = new Array[Byte](hexLen)
      var j = 0
      while (j < hexBytes) {
        val b = digest(j) & 0xff
        hex(2 * j) = HexChars(b >>> 4).toByte
        if (2 * j + 1 < hexLen) hex(2 * j + 1) = HexChars(b & 0xf).toByte
        j += 1
      }
      out(g) = UTF8String.fromBytes(hex)
      g += 1
    }
    new GenericArrayData(out)
  }
}
