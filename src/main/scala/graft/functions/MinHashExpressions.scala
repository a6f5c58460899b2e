package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native Catalyst expression: MinHash signature of a shingle-hash set.
 *
 * `sig[j] = min over shingle hashes h of xxhash64(j, h)` — bit-identical to
 * composing Spark's builtin `xxhash64` (seed 42, sequential fold:
 * `hashLong(h, hashLong(j, 42))`), which is an independent hash family keyed
 * by the permutation index j (the overflow-free analog of the classic
 * `a·h+b mod p` family).
 *
 * Why an expression and not `transform(sequence(...), j -> array_min(
 * transform(sh, h -> xxhash64(j, h))))`: Catalyst higher-order functions are
 * evaluated interpreted — a lambda dispatch + boxing per element, plus an
 * intermediate array per permutation. At numPerms=64 that is O(64·|shingles|)
 * interpreted steps and 64 array allocations PER ROW; round-1 bench measured
 * 97 s for 5000 docs at sf0.1 (q27's dominant cost). This tight double loop
 * over the unsafe array data with inlined XXH64 is the same computation in
 * ~0.2 s — and it stays inside whole-stage codegen.
 *
 * Scale note: per-row CPU only, zero shuffle; the signature (numPerms × 8
 * bytes) replaces the document text in everything downstream, so computing
 * it early also shrinks the LSH shuffle payload.
 */
case class MinHashSignature(child: Expression, numPerms: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numPerms > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"numPerms must be positive, got $numPerms")
    case dt =>
      TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<bigint> input, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val sig = new Array[Long](numPerms)
    var j = 0
    while (j < numPerms) {
      val seed = XXH64.hashLong(j.toLong, 42L)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = XXH64.hashLong(a.getLong(i), seed)
        if (h < m) m = h
        i += 1
      }
      sig(j) = m
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val seed = ctx.freshName("seed")
      val m = ctx.freshName("m")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |final int $n = $a.numElements();
         |final long[] $sig = new long[$numPerms];
         |for (int $j = 0; $j < $numPerms; $j++) {
         |  final long $seed = $xxh.hashLong((long) $j, 42L);
         |  long $m = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = $xxh.hashLong($a.getLong($i), $seed);
         |    if ($h < $m) $m = $h;
         |  }
         |  $sig[$j] = $m;
         |}
         |${ev.value} = new $gad($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSignature {
  def apply(shingleHashes: Column, numPerms: Int): Column =
    GraftShims.column(new MinHashSignature(GraftShims.expression(shingleHashes), numPerms))
}

/**
 * Native Catalyst expression: LSH band hashes of a MinHash signature.
 *
 * `out[b] = xxhash64 fold (seed 42) of sig[b·rowsPerBand .. (b+1)·rowsPerBand)`
 * — one 64-bit bucket key per band, hashing the signature longs directly
 * (no stringification; the `concat_ws(",", cast-to-string…)` formulation it
 * replaces spent its time building strings interpreted). Band index is
 * recovered with `posexplode`, so the exploded candidate-generation rows
 * carry only (id, band, band_hash).
 */
case class BandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bands > 0 && rowsPerBand > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"bands and rowsPerBand must be positive, got ($bands, $rowsPerBand)")
    case dt =>
      TypeCheckResult.TypeCheckFailure(s"band_hashes needs array<bigint> input, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var i = b * rowsPerBand
      val end = math.min(i + rowsPerBand, n)
      while (i < end) {
        h = XXH64.hashLong(a.getLong(i), h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val end = ctx.freshName("end")
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 42L;
         |  final int $end = java.lang.Math.min(($b + 1) * $rowsPerBand, $n);
         |  for (int $i = $b * $rowsPerBand; $i < $end; $i++) {
         |    $h = $xxh.hashLong($a.getLong($i), $h);
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "band_hashes"
}

object BandHashes {
  def apply(sig: Column, bands: Int, rowsPerBand: Int): Column =
    GraftShims.column(new BandHashes(GraftShims.expression(sig), bands, rowsPerBand))
}

/**
 * Native Catalyst expression: exact Jaccard similarity of two SORTED
 * distinct `array<bigint>` sets, by linear merge-walk — O(|A|+|B|) per pair
 * with zero allocation, vs the interpreted hash-set build of
 * `array_intersect`/`array_union` per pair. Inputs must be sorted ascending
 * and duplicate-free (`array_sort(array_distinct(...))`, paid once per row,
 * not per pair). Integer set sizes ⇒ the double ratio is bit-identical
 * across engines.
 */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"jaccard_sorted needs two array<bigint>, got ($l, $r)")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0d else inter.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) { $i++; }
         |  else { $j++; }
         |}
         |final int $union = $na + $nb - $inter;
         |${ev.value} = $union == 0 ? 0.0 : (double) $inter / (double) $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sorted"
}

object JaccardSorted {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(new JaccardSorted(GraftShims.expression(a), GraftShims.expression(b)))
}
