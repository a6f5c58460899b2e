package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot join keys.
 *
 * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on by
 * default in Spark 4): it splits oversized sort-merge partitions at runtime.
 * Salting is the manual fallback for the cases AQE can't fix — a key so hot
 * that ONE key's rows exceed an executor (AQE can split the partition but
 * every split still hash-routes the same key to one reducer when the other
 * side must co-locate), or broadcast-averse medium-sized dimension sides.
 *
 * [[saltedJoin]]: the fact side gets a per-ROW salt in `[0, salt)` (rows of
 * the same hot key spread across `salt` reducers); the smaller side is
 * replicated `salt` times with every salt value; the join key becomes
 * (keys…, salt). Row-for-row identical to the plain join for inner /
 * left_outer / left_semi / left_anti (each fact row sees exactly one replica
 * of each matching row); right/full joins are rejected — replication would
 * duplicate unmatched right rows.
 *
 * Cost model: shuffle of the replicated side grows ×salt — use only when
 * `salt × |small side| ≪ |fact side|`, which is exactly the skewed-join
 * regime.
 */
object Skew {

  private val SaltCol = "__graft_salt"
  private val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
    "leftsemi", "left_anti", "leftanti")

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 1, s"salt must be > 1, got $salt")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    // Per-row spread from a hash of the WHOLE row (all columns, salted so it
    // differs from the join-key hash): deterministic across task retries —
    // a retried stage re-derives the same salt per row, so the physical
    // distribution is stable (the previous monotonically_increasing_id salt
    // was correct but retry-variant). Fully-duplicate rows share a salt,
    // costing uniformity only when a hot key's rows are near-identical.
    // maps are not hashable in Spark: salt from the hashable columns only
    // (the salt VALUE never affects correctness, only spread uniformity)
    val saltInputs = lit(0x5417ED) +: fact.schema.fields.toSeq
      .filter(f => Normalize.orderable(f.dataType))
      .map(f => graft.model.CqlSchema.qcol(f.name))
    val salted = fact.withColumn(SaltCol,
      pmod(xxhash64(saltInputs: _*), lit(salt.toLong)).cast("int"))
    val replicated = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
