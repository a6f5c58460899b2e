package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Fuzzy (edit-distance) joins — record linkage over near-identical strings
 * (title/name variants, OCR noise, near-duplicate short fields). The naive
 * formulation is an all-pairs cross join with `levenshtein() <= d`; at any
 * real scale that's O(n²) rows through a BroadcastNestedLoopJoin — the
 * classic scale-killer.
 *
 * This implementation BLOCKS first: candidates must agree on a cheap
 * equi-key (string prefix), and pass a length-band pre-filter
 * (|len(a) - len(b)| <= d is a lower bound on edit distance), so the join
 * is a plain hash/sort-merge equi-join whose per-block fan-out is bounded
 * by the blocking key's selectivity. Only candidates inside a block pay
 * the O(len²) levenshtein.
 *
 * Prefix blocking is a RECALL TRADE, stated plainly: a pair whose edit
 * difference falls inside the first `blockPrefix` chars lands in different
 * blocks and is missed. That's the standard production trade (cf. blocking
 * in record-linkage literature); for guaranteed-complete small inputs use
 * `blockPrefix = 0`, which degrades to the exact cross join.
 */
object Fuzzy {

  /**
   * Self-join `df` on `strCol`: pairs (a, b) with `idCol(a) < idCol(b)` and
   * `levenshtein <= maxDist`, blocked by the first `blockPrefix` chars.
   * Output: a_<id>, b_<id>, a_<str>, b_<str>, dist.
   */
  def selfJoinByEditDistance(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      blockPrefix: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(blockPrefix >= 0, "blockPrefix must be >= 0")
    val a = df.select(col(idCol).as(s"a_$idCol"), col(strCol).as(s"a_$strCol"))
    val b = df.select(col(idCol).as(s"b_$idCol"), col(strCol).as(s"b_$strCol"))
    val block =
      if (blockPrefix == 0) lit(true)
      else substring(col(s"a_$strCol"), 1, blockPrefix) ===
        substring(col(s"b_$strCol"), 1, blockPrefix)
    a.join(b,
        block &&
          col(s"a_$idCol") < col(s"b_$idCol") &&
          abs(length(col(s"a_$strCol")) - length(col(s"b_$strCol"))) <= maxDist)
      .withColumn("dist", levenshtein(col(s"a_$strCol"), col(s"b_$strCol")))
      .filter(col("dist") <= maxDist)
  }
}
