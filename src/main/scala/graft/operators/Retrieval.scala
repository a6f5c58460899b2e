package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval: fuse sparse (BM25, [[Vocab.bm25TopK]]) and dense
 * (embedding cosine, [[Similarity.bruteForceTopK]] or its LSH/IVF/PQ scale
 * variants) ranked lists with reciprocal rank fusion (Cormack et al., the
 * standard fusion for lexical+semantic search and RAG retrieval):
 *
 *   rrf(q, d) = Σ_lists 1 / (rrfK + rank_list(q, d))     (absent ⇒ 0)
 *
 * Scale shape: the inputs are per-query TOP-K tables (|Q|·k rows each —
 * the heavy corpus work already happened inside the retrievers, shaped as
 * documented there), so fusion cost is independent of corpus size: the
 * full-outer joins hash tiny rank tables on (query, id), and the final
 * per-query cut is a rank-limit window that Spark plans as
 * `WindowGroupLimit` (partial top-k before the exchange; PlanQualitySpec
 * gates it for the composed hybrid).
 *
 * Cross-engine determinism: rrf scores are sums of 1/(rrfK + rank) over a
 * FIXED list order — each term is one correctly-rounded IEEE division of
 * integers and the left-to-right addition order is part of the operator
 * contract, so the double score is bit-identical in any IEEE engine (the
 * battery oracle replays it in SQL). Ties break by document id.
 */
object Retrieval {

  /** Fuse per-query ranked lists (each with columns `queryIdCol`, `idCol`,
   *  `rank`) into a per-query rrf top-k:
   *  (queryIdCol, idCol, rank, rrf_score). */
  def rrfFuse(
      lists: Seq[DataFrame],
      queryIdCol: String,
      idCol: String,
      k: Int,
      rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k > 0 && rrfK >= 0, "k must be positive, rrfK non-negative")
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(queryIdCol), col(idCol), col("rank").as(s"__rrf_r$i"))
    }
    val joined = tagged.reduce(
      (a, b) => a.join(b, Seq(queryIdCol, idCol), "full_outer"))
    val score: Column = lists.indices
      .map(i => coalesce(
        lit(1.0) / (lit(rrfK).cast("double") + col(s"__rrf_r$i").cast("double")),
        lit(0.0)))
      .reduce(_ + _) // fixed left-to-right order — see determinism note
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    joined.withColumn("rrf_score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rank"), col("rrf_score"))
  }

  /** The dense leg's contract: (corpus(id, vec), queries(id, vec), idCol,
   *  vecCol, k) → (query_id, neighbor_id, rank) per-query top-k. Built-ins
   *  below wrap each [[Similarity]] ANN tier; anything matching the shape
   *  plugs in. */
  type DenseRetriever = (DataFrame, DataFrame, String, String, Int) => DataFrame

  /** Exact brute-force cosine — the small-corpus default. */
  val DenseExact: DenseRetriever = (c, q, id, vec, k) =>
    Similarity.bruteForceTopK(c, q, id, vec, k, excludeSelf = false)

  /** Sign-LSH bucketed cosine — the 100 TB path: only bucket-colliding
   *  pairs score ([[Similarity.lshTopK]]'s shape notes). */
  def denseLsh(planes: Int = 8, probeHamming: Int = 1): DenseRetriever =
    (c, q, id, vec, k) => Similarity.lshTopK(c, q, id, vec, k, planes, probeHamming)

  /** int8-quantized scan with exact float rescore —
   *  [[Similarity.quantizedTopK]]. */
  def denseQuantized(rescoreFactor: Int = 4): DenseRetriever =
    (c, q, id, vec, k) => Similarity.quantizedTopK(c, q, id, vec, k, rescoreFactor)

  /**
   * End-to-end hybrid top-k: BM25 over `textCol` fused with dense cosine
   * over `vecCol`, both fetched to `depth` (fetch more than you keep — the
   * standard fusion practice so a document strong in one modality can
   * surface), then rrf-cut to `k`. `queries` must carry `queryIdCol`,
   * `queryTextCol`, and `vecCol`. Self-matches are NOT excluded — a query
   * drawn from the corpus fuses to itself at rank 1, which the caller can
   * drop. The dense leg is pluggable: [[DenseExact]] (default) for small
   * corpora, [[denseLsh]]/[[denseQuantized]] where a brute-force scan is
   * too hot — the fusion contract only needs (query, id, rank) tables, so
   * swapping tiers never changes the pipeline shape.
   */
  def hybridTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      textCol: String,
      vecCol: String,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      depth: Int = 0,
      rrfK: Int = 60,
      dense: DenseRetriever = DenseExact): DataFrame = {
    val d = if (depth > 0) depth else 2 * k
    val sparse = Vocab.bm25TopK(
      corpus.select(col(idCol), col(textCol)), idCol, textCol,
      queries.select(col(queryIdCol), col(queryTextCol)), queryIdCol, queryTextCol, k = d)
      .select(col(queryIdCol), col(idCol), col("rank"))
    val denseRanks = dense(
      corpus.select(col(idCol), col(vecCol)),
      queries.select(col(queryIdCol).as(idCol), col(vecCol)),
      idCol, vecCol, d)
      .select(col("query_id").as(queryIdCol), col("neighbor_id").as(idCol), col("rank"))
    rrfFuse(Seq(sparse, denseRanks), queryIdCol, idCol, k, rrfK)
  }
}
