package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One-pass corpus profiling — the "look at the table before training on
 * it" step: per-column row/null/distinct counts and min/max, computed in
 * a SINGLE aggregation over one scan and melted to one row per column.
 *
 * Scale shape: with `exactDistinct = true` (default, the battery-oracled
 * path) Spark plans the multiple exact `count(distinct)`s via the Expand
 * operator — the scan is read once and expanded |cols|+1 ways into one
 * shuffled aggregation (the standard multi-distinct plan; each expanded
 * row carries a single column's value, so the shuffle is narrow). With
 * `exactDistinct = false` the distincts become `approx_count_distinct`
 * (HLL++, deterministic) and the plan collapses to one partial-aggregated
 * pass with constant-size sketch state and no Expand — the right call for
 * 100 TB-wide profiles where a few percent error on n_distinct is fine
 * (`approxRsd` sets the target relative standard deviation, default
 * Spark's 0.05; tighter rsd = bigger sketch); every other cell stays
 * exact.
 *
 * min/max are computed on the NATIVE type (so numeric columns order
 * numerically) and emitted as strings to give every column one schema.
 */
object Profiling {

  def summarize(
      df: DataFrame, cols: Seq[String], exactDistinct: Boolean = true,
      approxRsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    // backtick-quote every reference: a literal column name containing a
    // dot would otherwise parse as struct-field access and fail resolution
    def q(name: String): Column = col(s"`$name`")
    val aggs: Seq[Column] =
      count(lit(1)).as("__n_rows") +: cols.flatMap { c =>
        Seq(
          count(q(c)).as(s"__nn_$c"), // non-null count
          (if (exactDistinct) count_distinct(q(c))
           else approx_count_distinct(q(c), approxRsd)).as(s"__nd_$c"),
          min(q(c)).cast("string").as(s"__mn_$c"),
          max(q(c)).cast("string").as(s"__mx_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - q(s"__nn_$c")).as("n_nulls"),
        q(s"__nd_$c").as("n_distinct"),
        q(s"__mn_$c").as("min_str"),
        q(s"__mx_$c").as("max_str"))
    }
    one.select(explode(array(perCol: _*)).as("m")).select(col("m.*"))
  }
}
