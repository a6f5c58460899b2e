package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable k-means (Lloyd) on an integer grid —
 * topic/domain clustering for corpus curation (the partitioning step
 * behind cluster-balanced sampling, SemDeDup-style dedup, and per-domain
 * mixture weights) whose ASSIGNMENTS are bit-replayable in any engine:
 *
 *  - vectors are quantized ONCE to a `1/scale` grid:
 *    `q_d = floor(x_d * scale)` (float→double is exact, the product is one
 *    IEEE multiply, floor is exact — identical everywhere);
 *  - distances are EXACT integer sums Σ_d (q_d − c_d)²; argmin ties break
 *    by centroid index. No float accumulation order anywhere;
 *  - the update step keeps centroids ON the grid:
 *    `c_d = floor(sum / count)` via one double division (sum ≤ 2^53, the
 *    division result sits ≥ 1/count away from the next integer unless it
 *    IS one — floor is unambiguous and engine-identical). An emptied
 *    cluster keeps its previous centroid;
 *  - seeds = the k vectors with smallest ids (deterministic; callers
 *    wanting spread seeds can pre-shuffle ids with
 *    [[Sampling.shuffleOrder]], which is itself a pure key function).
 *
 * The 1e-6 default grid perturbs distances by ≤ 2·dim·scaleErr — far
 * below any real cluster separation; what it buys is a closed-form SQL
 * oracle for the whole training loop (battery q170 retrains 2 iterations
 * in DuckDB and matches assignments AND exact integer distances).
 *
 * Scale shape: per iteration, assignment is a broadcast plan-literal map
 * (k×dim longs inside the expression — zero corpus shuffle, codegen'd
 * zip_with/aggregate), and the update is ONE narrow (cluster, dim, q)
 * exchange of exploded scalars (the [[Similarity.meanVectors]] shape —
 * the text/vector payload never moves). Driver state per iteration is
 * k×dim longs. Overflow bounds: |q| ≤ B requires 4·dim·B² < 2^63 — at
 * B = 2e6 (unit-ish floats on the 1e-6 grid), dim ≤ 500k.
 */
object Clustering {

  /** Final assignment (idCol, cluster, dist) plus grid centroids; `dist`
   *  is the EXACT integer squared distance on the grid. */
  def kMeansAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2,
      scale: Long = 1000000L): DataFrame = {
    require(k > 0 && iters >= 1 && scale > 0, "k, iters, scale must be positive")
    val q = df.select(col(idCol), quantize(col(vecCol), scale).as("__q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Array[Array[Long]] = q
        .orderBy(col(idCol).asc).limit(k)
        .select(col("__q")).collect()
        .map(_.getSeq[Long](0).toArray)
      require(centroids.length == k, s"need at least $k vectors, got ${centroids.length}")
      val dim = centroids.head.length
      // ragged vectors would zip_with into null distances and a null
      // cluster — validate IN-PASS (the meanVectors pattern) instead of
      // paying a second scan or failing cryptically downstream
      val checked = q.withColumn("__q",
        when(size(col("__q")) === dim, col("__q"))
          .otherwise(raise_error(concat(
            lit(s"kMeansAssign: vector with dimension <> $dim at "),
            col(idCol).cast("string")))))
      var it = 0
      while (it < iters) {
        val assigned = checked.withColumn("__cl", argminCluster(col("__q"), centroids))
        val means = assigned
          .select(col("__cl"), posexplode(col("__q")).as(Seq("__dim", "__qv")))
          .groupBy(col("__cl"), col("__dim"))
          .agg(sum(col("__qv")).as("__s"), count(lit(1)).as("__n"))
          .collect()
        val next = centroids.map(_.clone()) // emptied cluster keeps its centroid
        means.foreach { r =>
          val (cl, d) = (r.getInt(0), r.getInt(1))
          require(d < dim, s"vector longer than the seed dimension $dim at cluster $cl")
          next(cl)(d) = math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
        }
        centroids = next
        it += 1
      }
      val last = argminCluster(col("__q"), centroids)
      val dists = distances(col("__q"), centroids)
      checked.withColumn("cluster", last)
        .withColumn("dist", element_at(dists, col("cluster") + lit(1)))
        .select(col(idCol), col("cluster"), col("dist"))
    } finally q.unpersist()
  }

  /** floor(x_d · scale) as long, one IEEE multiply per component. */
  private def quantize(vec: Column, scale: Long): Column =
    transform(vec, x => floor(x.cast("double") * lit(scale.toDouble)).cast("long"))

  /** array of exact integer squared distances, one per centroid. */
  private def distances(qv: Column, centroids: Array[Array[Long]]): Column =
    array(centroids.map { c =>
      aggregate(
        zip_with(qv, typedLit(c.toSeq), (x, cc) => (x - cc) * (x - cc)),
        lit(0L), (acc, e) => acc + e)
    }.toIndexedSeq: _*)

  /** argmin centroid index, first (lowest) index on ties. */
  private def argminCluster(qv: Column, centroids: Array[Array[Long]]): Column = {
    val ds = distances(qv, centroids)
    (array_position(ds, array_min(ds)) - lit(1L)).cast("int")
  }
}
