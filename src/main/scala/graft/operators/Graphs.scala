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
 *               [+ ⌊dnum · D_t / (dden·N)⌋  when conserveDanglingMass]
 *
 * Multi-edges count: outdeg is edge multiplicity and each parallel edge
 * carries one share — link counts ARE the weight. Dangling mass (vertices
 * with no out-edges) is DROPPED by default, the standard simplification;
 * `conserveDanglingMass = true` spreads each step's dangling total D_t
 * uniformly instead (one extra map-side-combined aggregate per iteration
 * — an anti-join of ranks against outdeg reduced to ONE long; per-step
 * lineage truncation keeps each such driver action at ONE join, never a
 * replay of prior iterations), for uses
 * where rank MASS matters, not just the ordering. Floor quantization
 * error per step is < 1 unit of `scale` = 1e-12 of total mass at the
 * default.
 *
 * Scale shape: one distinct-vertex pass, one outdeg aggregate, then per
 * iteration ONE hash join of edges to the current rank table (narrow:
 * (src, dst) and (vertex, pr) longs only) and ONE map-side-combined sum
 * on dst — the textbook two-exchange PageRank step; at 100 TB
 * pre-partition edges by src once and every iteration's join reuses that
 * layout. Driver state: two scalars (N and the base term) plus, under
 * conservation, one long per iteration. The FINAL ranking is the
 * [[Sampling.takeByBudget]] range-exchange prefix rank — fully
 * distributed, never a single-partition window over the vertex table (a
 * web crawl has 10⁸-10⁹ hosts). Deep iteration counts truncate lineage
 * with an eager localCheckpoint per step (same discipline as
 * [[Dedup]]'s connectedComponents), so the plan does not grow with
 * `iters`.
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
      dampDen: Long = 100L,
      conserveDanglingMass: Boolean = false): DataFrame = {
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
    // default 2 iterations stay a pure lazy plan (cheap to recompute, no
    // cache lifetime to manage); deeper loops would grow the plan
    // super-linearly — truncate per step instead. Conservation ALWAYS
    // truncates past the first step: its per-iteration dangling aggregate
    // is a driver action against the current `pr`, and without truncation
    // each action would recompute every prior iteration's joins from
    // scratch — O(iters²) joins even at the default iteration count
    val truncateLineage = iters > 2 || (conserveDanglingMass && iters > 1)
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
        // dangling mass: total pr on vertices with no out-edges — one
        // anti-join reduced map-side to a single long on the driver
        val danglingTerm: Long =
          if (!conserveDanglingMass) 0L
          else {
            val d = pr.join(outdeg.withColumnRenamed("__src", "__v"), Seq("__v"), "left_anti")
              .agg(coalesce(sum(col("__pr")), lit(0L))).head.getLong(0)
            dampNum * d / (dampDen * n) // exact long math, same grid as baseTerm
          }
        pr = vertices
          .join(inflow.withColumnRenamed("__dst", "__v"), Seq("__v"), "left")
          .select(col("__v"),
            (lit(baseTerm + danglingTerm) +
              floor(lit(dampNum) * coalesce(col("__in"), lit(0L)) / lit(dampDen))
                .cast("long")).as("__pr"))
        if (truncateLineage) pr = pr.localCheckpoint(eager = true)
        it += 1
      }
      // distributed global rank: range exchange on (pr desc, v asc) + the
      // takeByBudget prefix machinery with unit cost and an unbounded
      // budget = exact row_number, no single-partition Exchange anywhere
      Sampling.takeByBudget(
          pr.withColumn("__one", lit(1L)), "__one", Long.MaxValue,
          Seq(col("__pr").desc, col("__v").asc), outCol = "__rank")
        .select(col("__v").as("vertex"), col("__pr").as("pr"),
          col("__rank").cast("int").as("rank"))
    }
  }
}
