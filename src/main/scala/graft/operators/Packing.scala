package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing — the "concat-and-chunk" step that turns a document
 * corpus into fixed-budget training sequences: within each shard, documents
 * are taken in a deterministic order and assigned to consecutive bins of
 * ~`budget` size units (tokens, chars, bytes).
 *
 * Formulation: `bin = floor(prefix_sum_BEFORE_this_row / budget)` over a
 * (shard, order) window — a document starts a new bin exactly when the
 * running total crosses a budget boundary, and a document larger than the
 * budget takes bins alone. This is the standard streaming-concat
 * approximation of bin packing (optimal packing is NP-hard and
 * order-destroying; training pipelines want deterministic order anyway).
 *
 * Scale shape: ONE shuffle (hash by shard), then a sorted window per
 * shard — at 100 TB you shard by corpus slice (source, language, hash
 * bucket) so each shard's window fits an executor; the assignment itself
 * adds no further exchange, and the whole thing is expressible to the
 * oracle as a window query (the battery hash-matches it against DuckDB).
 */
object Packing {

  /** Assign each row a `bin` within its shard (see object doc). */
  def assignBins(
      df: DataFrame,
      shardCols: Seq[String],
      orderCols: Seq[String],
      sizeCol: String,
      budget: Long,
      binCol: String = "bin"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(orderCols.nonEmpty, "need a deterministic order inside each shard")
    val before = Window.partitionBy(shardCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(binCol,
      floor(coalesce(sum(col(sizeCol)).over(before), lit(0L)) / budget))
  }

  /** Per-bin summary (count, fill, largest member) — the packing QA view. */
  def binStats(
      df: DataFrame,
      shardCols: Seq[String],
      orderCols: Seq[String],
      sizeCol: String,
      budget: Long): DataFrame =
    assignBins(df, shardCols, orderCols, sizeCol, budget)
      .groupBy((shardCols :+ "bin").map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("fill"),
        max(col(sizeCol)).as("largest"))
}
