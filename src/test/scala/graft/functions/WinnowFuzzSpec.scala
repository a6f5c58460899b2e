package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the monotonic-deque sliding-window minimum inside
 * [[WinnowFingerprint.compute]] to the naive O(n·w) rescan it replaced:
 * both must produce identical fingerprints for arbitrary text and any
 * (k, w). Pure JVM — no SparkSession needed (q117/q118 already gate the
 * end-to-end column path against the DuckDB oracle).
 */
class WinnowFuzzSpec extends AnyFunSuite {

  /** The pre-deque formulation, kept verbatim as the oracle. */
  private def naive(u: UTF8String, k: Int, w: Int): Seq[Long] = {
    val bytes = u.getBytes
    val md = java.security.MessageDigest.getInstance("MD5")
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
      var j = 0
      while (j < nWins) {
        var m = Long.MaxValue
        var t = j
        while (t < j + w) { if (hs(t) < m) m = hs(t); t += 1 }
        mins(j) = m
        j += 1
      }
    } else {
      var m = Long.MaxValue
      var t = 0
      while (t < nGrams) { if (hs(t) < m) m = hs(t); t += 1 }
      mins(0) = m
    }
    mins.toSeq.distinct.sorted
  }

  private def deque(s: String, k: Int, w: Int): Seq[Long] = {
    val arr = WinnowFingerprint.compute(UTF8String.fromString(s), k, w)
    arr.toLongArray().toSeq
  }

  test("deque window minimum equals the naive rescan on random text, all (k, w)") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abcde", "abcdefghij xyz,.!")
    for (trial <- 1 to 300) {
      val alpha = alphabets(trial % alphabets.size)
      val len = rnd.nextInt(120) // includes 0 and shorter-than-k
      val s = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val k = 2 + rnd.nextInt(7)
      val w = 1 + rnd.nextInt(12) // w = 1 and w >> nGrams edges included
      val got = deque(s, k, w)
      val want = naive(UTF8String.fromString(s), k, w)
      assert(got === want, s"trial $trial len=$len k=$k w=$w text='$s'")
    }
  }

  test("deque handles adversarial orderings: sorted, reverse, constant runs") {
    // constant text -> all gram hashes equal (ties exercise the >= pop);
    // the naive oracle is the ground truth either way
    for (s <- Seq("aaaaaaaaaaaaaaaaaaaa", "abababababababab",
                  "abcdefghijklmnopqrst", "tsrqponmlkjihgfedcba");
         w <- Seq(1, 2, 4, 7, 19, 50)) {
      assert(deque(s, 4, w) === naive(UTF8String.fromString(s), 4, w),
        s"text='$s' w=$w")
    }
  }

  test("large w stays linear: 200k grams with w = 50k completes instantly") {
    val s = new scala.util.Random(7).alphanumeric.take(200000).mkString
    val t0 = System.nanoTime()
    val fp = deque(s, 8, 50000)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(fp.nonEmpty)
    // O(n·w) would be ~10^10 comparisons here; the deque does one pass.
    // Generous bound — this is a smoke check, not a benchmark.
    assert(ms < 30000, s"took $ms ms — did the window min regress to O(n*w)?")
  }
}
