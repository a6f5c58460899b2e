package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Integer-grid PageRank — the domain/host authority signal crawl
 * pipelines rank seed lists and weight corpus mixes by (the hyperlink
 * analog of the count-LM quality prior), computed with the same
 * engine-portability discipline as [[Clustering.kMeansAssign]]: every
 * arithmetic step is an exact integer operation (scaled mass, floor
 * divisions, exact BIGINT sums), so the battery oracle REPLAYS the full
 * iteration loop in SQL bit-for-bit — no float accumulation order
 * anywhere, no tolerance.
 *
 *   pr_0(v)   = ⌊scale / N⌋
 *   share_t(u) = ⌊pr_t(u) / outdeg(u)⌋            (per multi-edge)
 *   pr_{t+1}(v) = ⌊scale·(dden−dnum) / (dden·N)⌋
 *               + ⌊dnum · Σ_{u→v} share_t(u) / dden⌋
 *
 * Multi-edges count: outdeg is edge multiplicity and each parallel edge
 * carries one share — link counts ARE the weight. Dangling mass (vertices
 * with no out-edges) is dropped, the standard simplification; totals are
 * not conserved but the RANKING — the thing pipelines consume — is the
 * fixture-stable quantity. Floor quantization error per step is < 1 unit
 * of `scale` = 1e-12 of total mass at the default.
 *
 * Scale shape: one distinct-vertex pass, one outdeg aggregate, then per
 * iteration ONE hash join of edges to the current rank table (narrow:
 * (src, dst) and (vertex, pr) longs only) and ONE map-side-combined sum
 * on dst — the textbook two-exchange PageRank step; at 100 TB
 * pre-partition edges by src once and every iteration's join reuses that
 * layout. Driver state: two scalars (N and the base term).
 */
object Graphs {

  /** (vertex, pr, rank) — pr on the integer grid, rank dense by
   *  (pr desc, vertex asc). */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 2,
      scale: Long = 1000000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && scale > 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "need iters >= 1, scale > 0, 0 <= dampNum <= dampDen")
    // the edge and vertex tables are referenced once per iteration in the
    // RETURNED lazy plan — at bench scale recomputing the narrow
    // projections is cheaper than managing cache lifetime across the
    // caller's actions; a 100 TB deployment persists `edges` itself once
    // (pre-partitioned by src) before calling in
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val vertices = e.select(col("__src").as("__v"))
      .unionByName(e.select(col("__dst").as("__v"))).distinct()
    val n = vertices.count()
    require(n > 0, "pageRank needs at least one edge")
    locally {
      val outdeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
      val baseTerm = scale * (dampDen - dampNum) / (dampDen * n) // exact long math
      var pr = vertices.withColumn("__pr", lit(scale / n))
      var it = 0
      while (it < iters) {
        val shares = e
          .join(pr.withColumnRenamed("__v", "__src"), "__src")
          .join(outdeg, "__src")
          // explicit floor of the one IEEE division — identical in every
          // engine (a bare cast would truncate here but ROUND in others)
          .select(col("__dst"), floor(col("__pr") / col("__deg")).cast("long").as("__share"))
        val inflow = shares.groupBy(col("__dst")).agg(sum(col("__share")).as("__in"))
        pr = vertices
          .join(inflow.withColumnRenamed("__dst", "__v"), Seq("__v"), "left")
          .select(col("__v"),
            (lit(baseTerm) +
              floor(lit(dampNum) * coalesce(col("__in"), lit(0L)) / lit(dampDen))
                .cast("long")).as("__pr"))
        it += 1
      }
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("__pr").desc, col("__v").asc)
      // the final rank is a global ordering of the (small) vertex table —
      // a single-partition window over |V| rows, not over edges
      pr.withColumn("rank", row_number().over(w))
        .select(col("__v").as("vertex"), col("__pr").as("pr"), col("rank"))
    }
  }
}
