package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native winnowing fingerprint: sorted distinct sliding-window minima of
 * 32-bit gram hashes (first 4 md5 bytes, big-endian unsigned — the
 * engine-portable convention `conv(substring(md5(g),1,8),16,10)` that the
 * DuckDB oracle replays).
 *
 * Why an expression and not the `transform(sequence(...), i -> md5(...))`
 * column formulation: Catalyst higher-order functions evaluate interpreted
 * — one lambda dispatch + boxed md5 expression eval PER GRAM. A 500-char
 * document is ~500 interpreted md5 calls; at sf0.1 the q118 overlap join
 * did not finish in 10 minutes. This one-pass loop (single String
 * conversion, one reused MessageDigest, primitive arrays) is the identical
 * computation at scan speed — the MinHashSignature HOF→native precedent.
 */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 2 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp needs k >= 2 and w >= 1, got k=$k w=$w")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp needs a string column, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = WinnowFingerprint.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = ($cls.compute($s, $k, $w));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fp"
}

object WinnowFingerprint {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /**
   * Shared eval for interpreted and generated code paths. Grams are k-BYTE
   * windows of the UTF-8 encoding (the [[NgramMd5Hashes]] convention):
   * digesting `bytes[i, i+k)` directly avoids both the per-gram
   * substring/getBytes allocations and the UTF-16 surrogate-splitting a
   * char-based window would suffer on non-BMP text (a split emoji encodes
   * as '?' and collapses distinct grams). On ASCII text byte windows and
   * character windows coincide — which is what the DuckDB oracle replays.
   */
  def compute(u: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = u.getBytes
    val md = digest.get()
    def hash32(from: Int, len: Int): Long = {
      md.reset()
      md.update(bytes, from, len)
      val d = md.digest()
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val nGrams = if (bytes.length >= k) bytes.length - k + 1 else 1
    val hs = new Array[Long](nGrams)
    if (bytes.length >= k) {
      var i = 0
      while (i < nGrams) { hs(i) = hash32(i, k); i += 1 }
    } else hs(0) = hash32(0, bytes.length)
    val nWins = if (nGrams >= w) nGrams - w + 1 else 1
    val mins = new Array[Long](nWins)
    if (nGrams >= w) {
      // monotonic-deque sliding minimum: O(nGrams) for any w (each index
      // is pushed and popped at most once), replacing the naive O(n·w)
      // rescan — same values, fuzz-pinned against the naive formulation
      // in WinnowFuzzSpec
      val dq = new Array[Int](nGrams) // gram indices, hs strictly increasing
      var head = 0
      var tail = 0 // deque is dq[head, tail)
      var i = 0
      while (i < nGrams) {
        while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
        dq(tail) = i
        tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) mins(i - w + 1) = hs(dq(head))
        i += 1
      }
    } else {
      var m = Long.MaxValue
      var t = 0
      while (t < nGrams) { if (hs(t) < m) m = hs(t); t += 1 }
      mins(0) = m
    }
    java.util.Arrays.sort(mins)
    var cnt = 1
    var x = 1
    while (x < nWins) { if (mins(x) != mins(x - 1)) cnt += 1; x += 1 }
    val res = new Array[Long](cnt)
    res(0) = mins(0)
    var p = 1
    x = 1
    while (x < nWins) {
      if (mins(x) != mins(x - 1)) { res(p) = mins(x); p += 1 }
      x += 1
    }
    new GenericArrayData(res)
  }

  def apply(text: Column, k: Int, w: Int): Column =
    GraftShims.column(new WinnowFingerprint(GraftShims.expression(text), k, w))
}
