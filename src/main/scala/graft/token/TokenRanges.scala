package graft.token

import org.apache.spark.Partitioner

/**
 * Token-ring range math — the rebuild of the reference's writer
 * `TokenPartitioner` (`bulkwriter/TokenPartitioner.java:48-179`) and its
 * validated invariants (`:140-179`: complete ring coverage, no overlap) plus
 * the reader twin (`partitioner/TokenPartitioner.java:58-159`, splits =
 * `divCeil(max(cores, defaultParallelism), numRanges)` :123-134).
 *
 * The default write path uses Spark's `repartitionByRange` (sampled
 * boundaries adapt to data skew — normally the better choice at scale);
 * this exact splitter exists for ring-parity workloads: co-locating output
 * files with a fixed ring layout, reproducing the reference's split
 * arithmetic, and as the `Partitioner` for RDD-level exact placement.
 *
 * Ranges are `(start, end]`-closed on the end like Cassandra ranges, over
 * the Murmur3 domain `[Long.MinValue+1, Long.MaxValue]` (MinValue is
 * normalized away by the token function).
 */
object TokenRanges {

  final case class TokenRange(start: Long, end: Long) {
    require(start <= end, s"invalid range ($start, $end]")
    def contains(token: Long): Boolean = token > start && token <= end
    def width: BigInt = BigInt(end) - BigInt(start)
  }

  /** Smallest assignable token (Long.MinValue is normalized to MaxValue). */
  val RingMin: Long = Long.MinValue + 1
  val RingMax: Long = Long.MaxValue

  /**
   * Split the full ring into `n` contiguous ranges of near-equal width
   * (difference ≤ 1 token). Invariants (validated, mirroring
   * `TokenPartitioner.java:140-179`): ranges are adjacent, first starts at
   * ring minimum, last ends at ring maximum — complete coverage, zero
   * overlap.
   */
  def splitRing(n: Int): IndexedSeq[TokenRange] = {
    val ranges = splitRingBig(n, BigInt(RingMin), BigInt(RingMax))
      .map { case (a, b) => TokenRange(a.toLong, b.toLong) }
    validate(ranges)
    ranges
  }

  /** Partitioner-generic split: the same near-equal-width bounds arithmetic
   *  over an arbitrary BigInt token domain `[ringMin, ringMax]` — shared by
   *  the Murmur3 ring above and [[RandomToken.splits]] (ranges returned as
   *  `(start, end]` pairs with `start` of the first = ringMin - 1). */
  def splitRingBig(n: Int, ringMin: BigInt, ringMax: BigInt): IndexedSeq[(BigInt, BigInt)] = {
    require(n > 0, "need at least one split")
    val total = ringMax - ringMin + 1
    val bounds = (0 to n).map(i => ringMin - 1 + total * i / n)
    (0 until n).map(i => (bounds(i), bounds(i + 1)))
  }

  /** Coverage + no-overlap validation (throws on violation). */
  def validate(ranges: Seq[TokenRange]): Unit = {
    require(ranges.nonEmpty, "no ranges")
    require(ranges.head.start == RingMin - 1,
      s"ring not covered from minimum: ${ranges.head}")
    require(ranges.last.end == RingMax, s"ring not covered to maximum: ${ranges.last}")
    ranges.sliding(2).foreach {
      case Seq(a, b) =>
        require(a.end == b.start, s"gap or overlap between $a and $b")
      case _ =>
    }
  }

  /** Partition index for a token: binary search over range ends —
   *  O(log n), allocation-free (the `TreeRangeMap.get` analog,
   *  `bulkwriter/TokenPartitioner.java:96-101`). */
  def partitionFor(token: Long, ranges: IndexedSeq[TokenRange]): Int = {
    var lo = 0
    var hi = ranges.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (token <= ranges(mid).end) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Reference split-count rule: at least one split per token range, scaled
   *  so splits ≥ max(cores, defaultParallelism)
   *  (`partitioner/TokenPartitioner.java:123-134`). */
  def calculateSplits(numTokenRanges: Int, cores: Int, defaultParallelism: Int): Int = {
    val want = math.max(cores, defaultParallelism)
    (want + numTokenRanges - 1) / numTokenRanges
  }
}

/** RDD-level exact ring placement (SURVEY §7.3: "custom Partitioner only if
 *  exact ring-split parity needed"). */
class RingPartitioner(n: Int) extends Partitioner {
  private val ranges = TokenRanges.splitRing(n)
  override def numPartitions: Int = n
  override def getPartition(key: Any): Int = key match {
    case t: java.lang.Long => TokenRanges.partitionFor(t, ranges)
    case t: Long => TokenRanges.partitionFor(t, ranges)
    case other => throw new IllegalArgumentException(s"RingPartitioner needs a Long token, got $other")
  }
}
