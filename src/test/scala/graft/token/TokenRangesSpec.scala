package graft.token

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Ring-split invariants from the reference
 *  (`bulkwriter/TokenPartitioner.java:140-179`): complete coverage, no
 *  overlap, correct partition lookup. */
class TokenRangesSpec extends AnyFunSuite {

  /** raw ScalaCheck runner (no scalatestplus bridge in the offline cache) */
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }

  test("splitRing covers the ring exactly with adjacent near-equal ranges") {
    check(Prop.forAll(Gen.choose(1, 4096)) { n =>
      val ranges = TokenRanges.splitRing(n)
      TokenRanges.validate(ranges) // throws on gap/overlap/incomplete
      val widths = ranges.map(_.width)
      ranges.length == n && (widths.max - widths.min) <= 1
    })
  }

  test("partitionFor places every token in the range that contains it") {
    val tokenGen = Gen.choose(TokenRanges.RingMin, TokenRanges.RingMax)
    check(Prop.forAll(Gen.choose(1, 257), tokenGen) { (n, token) =>
      val ranges = TokenRanges.splitRing(n)
      ranges(TokenRanges.partitionFor(token, ranges)).contains(token)
    })
  }

  test("ring boundaries land in the first and last partitions") {
    val ranges = TokenRanges.splitRing(8)
    assert(TokenRanges.partitionFor(TokenRanges.RingMin, ranges) == 0)
    assert(TokenRanges.partitionFor(TokenRanges.RingMax, ranges) == 7)
  }

  test("RingPartitioner agrees with partitionFor") {
    val p = new RingPartitioner(16)
    val ranges = TokenRanges.splitRing(16)
    check(Prop.forAll(Gen.choose(TokenRanges.RingMin, TokenRanges.RingMax)) { t =>
      p.getPartition(t) == TokenRanges.partitionFor(t, ranges)
    })
  }

  test("calculateSplits mirrors the reference divCeil rule") {
    assert(TokenRanges.calculateSplits(numTokenRanges = 3, cores = 10, defaultParallelism = 8) == 4)
    assert(TokenRanges.calculateSplits(numTokenRanges = 1, cores = 32, defaultParallelism = 1) == 32)
    assert(TokenRanges.calculateSplits(numTokenRanges = 64, cores = 32, defaultParallelism = 16) == 1)
  }
}
