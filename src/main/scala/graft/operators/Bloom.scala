package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShims

/**
 * Distributed Bloom-filter membership — the probabilistic prefilter that
 * turns "join the whole batch against a billion-row key set" into "join
 * only the rows a compact sketch cannot rule out". Built on Spark's own
 * runtime-filter machinery ([[BloomFilterAggregate]] /
 * [[BloomFilterMightContain]], the expressions behind
 * `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`), so the sketch
 * aggregation is map-side combined, the probe is whole-stage codegen, and
 * no UDF appears anywhere.
 *
 * Contract: NO false negatives — `mightContain = false` proves the key was
 * not aggregated, so rows it clears are EXACTLY new. False positives
 * (≈ 0.9% at the default 10 bits/item) only route extra rows to whatever
 * exact check follows; callers that need exact semantics (e.g.
 * [[Dedup.dropExactAgainstCorpusBloom]]) verify the "might" side with an
 * exact join and lose nothing.
 *
 * Keys of any type are hashed with xxhash64 (nulls hash to the seed — a
 * stable non-null value — so null keys route deterministically and are
 * never silently dropped by three-valued logic).
 *
 * Size notes for 100 TB: the sketch is `expectedItems × bitsPerItem` bits
 * (1 B/item at the default) collected ONCE to the driver and shipped as a
 * plan literal — 1e9 corpus keys ≈ 1.25 GB, so at that extreme raise
 * `bitsPerItem` honesty: cap expectations or shard the corpus instead.
 * Spark clamps the sketch at
 * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default 8 MB) —
 * raise that conf alongside `expectedItems` for big corpora; an undersized
 * clamp only raises the false-positive rate (more exact-join work), never
 * breaks correctness.
 */
object Bloom {

  /** Aggregate `key` over `df` into a serialized Bloom filter (driver-side
   *  `Array[Byte]`, one action). */
  def build(
      df: DataFrame,
      key: Column,
      expectedItems: Long,
      bitsPerItem: Int = 10): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(bitsPerItem >= 1 && bitsPerItem <= 64,
      s"bitsPerItem out of range: $bitsPerItem")
    require(expectedItems <= Long.MaxValue / bitsPerItem,
      s"expectedItems * bitsPerItem overflows: $expectedItems * $bitsPerItem")
    val numBits = math.max(64L, expectedItems * bitsPerItem)
    val agg = new BloomFilterAggregate(
      GraftShims.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.select(GraftShims.column(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** Codegen membership probe against a built sketch: false ⇒ definitely
   *  absent; true ⇒ present or a false positive. */
  def mightContain(bloom: Array[Byte], key: Column): Column = {
    require(bloom != null && bloom.nonEmpty, "empty bloom filter")
    GraftShims.column(BloomFilterMightContain(
      Literal(bloom), GraftShims.expression(xxhash64(key))))
  }
}
