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
    // A band past the signature end would hash an empty slice to the constant
    // seed — every row lands in the same bucket and candidate generation goes
    // O(n²). band_hashes is SQL-registered with unchecked args, so guard here.
    if (bands.toLong * rowsPerBand > n)
      throw new IllegalArgumentException(
        s"band_hashes: bands*rowsPerBand (${bands.toLong * rowsPerBand}) exceeds " +
          s"signature length ($n); empty trailing bands would bucket all rows together")
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
         |if (${bands.toLong} * ${rowsPerBand}L > $n) {
         |  throw new IllegalArgumentException(
         |    "band_hashes: bands*rowsPerBand (" + (${bands.toLong} * ${rowsPerBand}L) +
         |    ") exceeds signature length (" + $n +
         |    "); empty trailing bands would bucket all rows together");
         |}
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

/**
 * Native expression: distinct xxhash64 hashes of the n-word shingles of a
 * text column — the fused equivalent of
 * `array_distinct(transform(shingles(text, n), s => xxhash64(s)))`, which
 * evaluates interpreted (lambda dispatch + a string allocation per shingle
 * per row). One pass over the text, hashes bit-identical to the builtin
 * `xxhash64` over the space-joined shingle string (seed 42), word splitting
 * identical to Spark's `split(text, " ")` (every single space splits; empty
 * tokens preserved).
 *
 * The heavy loop lives in [[WordShingleHashes.compute]]; codegen emits a
 * single static call so the surrounding projection stays in whole-stage
 * codegen.
 */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckFailure(s"shingle width must be positive, got $n")
    case dt => TypeCheckResult.TypeCheckFailure(s"word_shingle_hashes needs string input, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingleHashes.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WordShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hashes"
}

/**
 * Native expression: 64-bit SimHash over distinct word tokens — fused
 * equivalent of the higher-order formulation (distinct split tokens →
 * xxhash64 per token → per-bit ±1 vote → sign). One pass over the UTF-8
 * bytes; token hashes bit-identical to `xxhash64(token)` (seed 42).
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"simhash64 needs string input, got $dt")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  def apply(text: Column): Column =
    GraftShims.column(new SimHash64(GraftShims.expression(text)))

  def compute(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = text.getBytes
    val len = bytes.length
    // distinct word-token hashes (words split on every single space, empty
    // tokens included — mirrors array_distinct(split(text, " ")); dedup by
    // hash is equivalent up to 64-bit collisions)
    var numWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') numWords += 1; i += 1 }
    var cap = 8
    while (cap < numWords * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    val counts = new Array[Int](64)

    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        val h = XXH64.hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        var slot = h.toInt & mask
        var seen = false
        while (used(slot) && !seen) {
          if (table(slot) == h) seen = true else slot = (slot + 1) & mask
        }
        if (!seen) {
          used(slot) = true
          table(slot) = h
          var j = 0
          while (j < 64) {
            counts(j) += (((h >>> j) & 1L) * 2 - 1).toInt
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

object WordShingleHashes {
  def apply(text: Column, n: Int): Column =
    GraftShims.column(new WordShingleHashes(GraftShims.expression(text), n))

  /** One-pass shingle hashing over the UTF-8 bytes: word boundaries are
   *  single 0x20 bytes (safe in UTF-8 — multi-byte sequences never contain
   *  0x20); shingle bytes are the exact text span between word i's start and
   *  word i+n-1's end, which equals `concat_ws(" ", slice(words, i, n))`
   *  because splitting on EVERY space preserves empty tokens and rejoining
   *  with single spaces reproduces the original byte run. Distinctness via
   *  an open-addressing long set, first-occurrence order. */
  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // word start offsets: 0 and every position after a space
    var numWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') numWords += 1; i += 1 }
    val starts = new Array[Int](numWords + 1)
    var w = 1
    i = 0
    while (i < len) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(numWords) = len + 1 // sentinel: end of word k is starts(k+1)-1

    val numShingles = if (numWords >= n) numWords - n + 1 else 1
    val out = new Array[Long](numShingles)
    var outN = 0
    // open-addressing set sized to the next power of two >= 2*numShingles
    var cap = 8
    while (cap < numShingles * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1

    var s = 0
    while (s < numShingles) {
      val from = if (numWords >= n) starts(s) else 0
      val until = if (numWords >= n) starts(s + n) - 1 else len
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L)
      var slot = (h.toInt & mask)
      var seen = false
      while (used(slot) && !seen) {
        if (table(slot) == h) seen = true else slot = (slot + 1) & mask
      }
      if (!seen) {
        used(slot) = true
        table(slot) = h
        out(outN) = h
        outN += 1
      }
      s += 1
    }
    new GenericArrayData(if (outN == numShingles) out else java.util.Arrays.copyOf(out, outN))
  }
}
