package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of (point-in-time) join — for each left row, the single latest right
 * row with `rightTs <= leftTs` for the same key. The canonical time-series/
 * feature-lookup operator Spark has no builtin for (SURVEY §7.3 preference
 * order (a): compose existing ops).
 *
 * Plan shape — the scalable formulation: UNION the two sides tagged by
 * origin, then one ranking window per key ordered by (ts, side) with
 * `last(_, ignoreNulls)` carrying the most recent right payload forward
 * onto each left row. Exactly ONE shuffle (on the key) and no join
 * explosion — a naive `left.join(right, lts >= rts).groupBy(max)` is a
 * range cross-product that detonates on hot keys; this is O(n log n) per
 * key partition regardless of match multiplicity, with skew handled by
 * AQE like any other window.
 *
 * Tie semantics: a right row AT the left timestamp matches (sorts before
 * the left row via the side tag) — the same contract as DuckDB/pandas
 * `ASOF JOIN ... ON l.ts >= r.ts`, which the battery oracle (q56) checks.
 * Left rows with no preceding right row keep null payloads (left-join
 * semantics).
 *
 * The right payload is carried as ONE struct column, not per-column:
 * per-column `last(_, ignoreNulls)` would stitch fields from DIFFERENT
 * right rows whenever a payload column holds a null (the null would be
 * filled from an older row). Packing guarantees every output row's right
 * fields come from the single matched right row, nulls included.
 */
object AsOf {

  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    val lCols = left.columns.filterNot(keys.contains).toSeq
    val rCols = right.columns.filterNot(keys.contains).toSeq
    val collisions = lCols.toSet & rCols.toSet
    require(collisions.isEmpty, s"rename colliding columns before asof join: $collisions")
    if (rCols.isEmpty) return left

    val payloadType = StructType(rCols.map(c => right.schema(c)))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__graft_ts"), lit(1).as("__graft_side")) ++
        lCols.map(col) :+
        lit(null).cast(payloadType).as("__graft_rpay"): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__graft_ts"), lit(0).as("__graft_side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rCols.map(col): _*).as("__graft_rpay"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__graft_ts").asc, col("__graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__graft_rpay", last(col("__graft_rpay"), ignoreNulls = true).over(w))
    filled.filter(col("__graft_side") === 1)
      .select(keys.map(col) ++ lCols.map(col) ++
        rCols.map(c => col("__graft_rpay").getField(c).as(c)): _*)
  }

  /**
   * Interval (range) join: pair each left point row with every right
   * interval containing it (`start <= point <= end`), same key.
   *
   * A naive `join(l.point between r.start and r.end)` is a broadcast/
   * nested-loop cross product per key — quadratic on hot keys. This
   * formulation BUCKETIZES the domain: each interval explodes onto the
   * fixed-width buckets it covers, points map to one bucket, the join is a
   * plain equi-join on (key, bucket) + an exact post-filter. Shuffle is
   * O(points + Σ interval_width/bucket), join is hash-based, and bucket
   * width trades replication against selectivity (pick ≈ median interval
   * width).
   */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pCols = points.columns.filterNot(keys.contains).toSeq
    val iCols = intervals.columns.filterNot(keys.contains).toSeq
    val collisions = pCols.toSet & iCols.toSet
    require(collisions.isEmpty, s"rename colliding columns before interval join: $collisions")

    val p = points.withColumn("__graft_bucket",
      floor(col(pointCol).cast("long") / bucketWidth))
    val i = intervals.withColumn("__graft_bucket",
      explode(sequence(
        floor(col(startCol).cast("long") / bucketWidth),
        floor(col(endCol).cast("long") / bucketWidth))))
    p.join(i, keys :+ "__graft_bucket")
      .filter(col(pointCol).cast("long").between(
        col(startCol).cast("long"), col(endCol).cast("long")))
      .drop("__graft_bucket")
  }
}
