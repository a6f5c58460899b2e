package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expression: dot product of two `array<float>` embedding
 * columns, accumulated in double, left-to-right (IEEE-deterministic — the
 * same value on every executor, every partitioning, every engine that
 * evaluates l-to-r in double).
 *
 * This is the hot inner loop of every similarity operator (brute-force ANN,
 * near-dup pair mining): at n vectors the pair space is O(n²), so the
 * per-pair cost decides whether the operator is usable. A codegen'd tight
 * loop over the unsafe array data (no boxing, no per-element virtual calls,
 * stays inside whole-stage codegen with the surrounding join) is ~100-1000×
 * cheaper per pair than composing `zip_with`/`aggregate` builtins over
 * DECIMAL — which is exactly what the round-1 benchmark showed (q28: 429 s
 * at sf0.1; this expression brings the same query under a few seconds).
 *
 * The reference has no vector ops (SURVEY §2.13: no UDF surface); this is
 * part of the training-data-pipeline extension layer. Preference order per
 * the build rules: native `Expression` with `doGenCode` > Scala UDF.
 */
case class DotProductF32(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 needs two array<float> inputs, got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f32"
}

object DotProductF32 {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(new DotProductF32(GraftShims.expression(a), GraftShims.expression(b)))
}

/**
 * Native expression: dot product of two int8-quantized vectors
 * (`array<tinyint>`), accumulated in long — the candidate-generation inner
 * loop of quantized ANN (`Similarity.quantizedTopK`). Integer multiply-add
 * over 1-byte lanes moves 4× less memory than the float loop and avoids FP
 * latency entirely; exact rescoring of the surviving candidates uses
 * [[DotProductF32]]. Same codegen shape as dot_f32: a tight primitive loop
 * inside whole-stage codegen.
 */
case class DotProductI8(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i8 needs two array<tinyint> inputs, got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_i8"
}

object DotProductI8 {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(new DotProductI8(GraftShims.expression(a), GraftShims.expression(b)))
}

/**
 * Native expression: random-hyperplane (sign) LSH bucket of an
 * `array<float>` vector — bit p of the result is the sign of the dot
 * product with pseudo-random hyperplane p, whose component (p, d) is
 * `xxhash64("graft_lsh{p}_{d}") / Long.MaxValue ∈ [-1, 1]` (bit-identical
 * to the builtin-composed formulation it replaces). Hyperplane components
 * are DATA-INDEPENDENT, so they are computed once per JVM and cached —
 * the per-row cost drops from planes×dims string builds + hashes to
 * planes×dims multiply-adds.
 */
case class SignBucketExpr(child: org.apache.spark.sql.catalyst.expressions.Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes >= 1 && planes <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(s"planes must be in [1, 63], got $planes")
    case dt => TypeCheckResult.TypeCheckFailure(s"sign_bucket needs array<float>, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    SignBucketExpr.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SignBucketExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a, $planes);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)

  override def prettyName: String = "sign_bucket"
}

object SignBucketExpr {
  def apply(vec: Column, planes: Int): Column =
    GraftShims.column(new SignBucketExpr(GraftShims.expression(vec), planes))

  private val componentCache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Double]()

  /** Hyperplane component (p, d): xxhash64 of the literal plane/dim string,
   *  mapped to [-1, 1]. Matches
   *  `xxhash64(concat("graft_lsh", p, "_", d)) / Long.MaxValue`. */
  private def component(p: Int, d: Int): Double = {
    val key = (p.toLong << 32) | (d.toLong & 0xffffffffL)
    var v = componentCache.get(key)
    if (v == null) {
      val bytes = s"graft_lsh${p}_$d".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      v = h.toDouble / Long.MaxValue.toDouble
      componentCache.put(key, v)
    }
    v
  }

  def compute(vec: ArrayData, planes: Int): Long = {
    val n = vec.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0d
      var d = 0
      while (d < n) {
        dot += vec.getFloat(d).toDouble * component(p, d)
        d += 1
      }
      if (dot > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}
