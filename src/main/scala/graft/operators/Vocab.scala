package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus vocabulary statistics — term counts, heavy hitters, document
 * frequencies and TF-IDF — the "what's in this corpus" layer of a
 * training-data pipeline (tokenizer vocab construction, boilerplate-term
 * discovery, keyword scoring for mixture curation).
 *
 * Scale shape, in order of appearance:
 *  - term counting is explode → hash-agg: the map-side partial combine
 *    collapses each partition to its distinct terms before the ONE shuffle,
 *    so shuffle volume is O(distinct terms per partition), not O(tokens) —
 *    at 100 TB the term universe (~1e6-1e8) is tiny next to the token count
 *    (~1e13) and the agg never spills the raw stream;
 *  - top-k never global-sorts: `orderBy(...).limit(k)` plans
 *    `TakeOrderedAndProject` (per-partition heap + driver merge of k rows);
 *  - TF-IDF is two aggregations over the exploded view joined back — the
 *    join key is the term, so the bigger side shuffles once; the corpus
 *    size N rides in via a broadcast one-row cross join, never a driver
 *    action inside the operator.
 *
 * Determinism: counts and TF (one IEEE division) are bit-identical across
 * engines. IDF is NOT: Spark's `log` is Java `StrictMath.log` (fdlibm),
 * glibc/DuckDB `log` differs by 1 ulp on some inputs (observed empirically
 * at ln(500/381)). Score-based RANKING is still portable — equal
 * (tf_count, df) pairs score bit-equal everywhere and distinct pairs
 * differ by far more than a ulp — but raw idf/score doubles must not be
 * hash-compared across engines.
 */
object Vocab {

  /** Whitespace tokens of `textCol`, one row per (id, word), empties dropped. */
  def explodeTerms(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)

  /** Corpus-wide term counts: one shuffle, map-side partial agg. */
  def termCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    explodeTerms(df, idCol, textCol)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Top-k terms by count (ties broken by word, total order → reproducible).
   *  Plans TakeOrderedAndProject — no global sort. */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    termCounts(df, idCol, textCol)
      .orderBy(col("n").desc, col("word").asc)
      .limit(k)

  /** Document frequency per term: distinct (doc, word) then count — two
   *  hash aggs on the same key, one shuffle (the second agg is a child of
   *  the first's exchange). */
  def docFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    explodeTerms(df, idCol, textCol).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))

  /**
   * TF-IDF per (document, term):
   *
   *   tf    = count(term in doc) / tokens(doc)
   *   idf   = ln(N / df(term))          (no smoothing: df >= 1 by construction)
   *   score = tf * idf
   *
   * Output columns: idCol, word, tf_count, df, tf, idf, score.
   */
  /**
   * BM25 retrieval: top-k documents per query under Okapi BM25
   * (Robertson/Sparck-Jones; the `+1` idf smoothing is the Lucene variant,
   * so idf > 0 always and per-term contributions are strictly positive):
   *
   *   idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
   *   contrib(t,d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
   *   score(q,d)  = Σ_{t ∈ q} contrib(t,d)
   *
   * Scale shape:
   *  - the corpus side is aggregated ONCE into (doc, word, tf) — the same
   *    map-side-combined explode as [[tfIdf]]; doc length and df both derive
   *    from that aggregate, never from a second corpus scan;
   *  - the query-term table is tiny and BROADCAST to the tf table, so the
   *    corpus never shuffles on the join — only matched (query, doc, term)
   *    rows (a small fraction at realistic query counts) flow into the final
   *    per-(query, doc) aggregation;
   *  - N and avgdl ride in as broadcast one-row cross joins;
   *  - top-k per query is a rank-limit window: Spark plans WindowGroupLimit
   *    (per-partition top-k before the exchange), never a global sort.
   *
   * Cross-engine determinism: the naive double sum over query terms is
   * order-dependent, so each per-term contribution (a deterministic IEEE
   * expression of the integers tf/df/dl/N and constants) is cast to
   * `decimal(22,7)` first — the decimal sum is exact and order-independent,
   * and 1-ulp `ln` skew between engines sits ~1e-16 relative, far inside the
   * 5e-8 rounding grid. The final score re-emerges as the nearest double of
   * that exact decimal in every engine. Ties rank by document id.
   *
   * Output: queryIdCol, idCol, rank, score, n_matched, tf_sum.
   */
  def bm25TopK(
      corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val perDoc = explodeTerms(corpus, idCol, textCol)
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf"))
    val dlen = perDoc.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val dfreq = perDoc.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val stats = corpus.agg(count(lit(1)).as("__n"))
      .crossJoin(dlen.agg(avg(col("dl").cast("double")).as("__avgdl")))
    val qterms = explodeTerms(queries, queryIdCol, queryTextCol).distinct()
    val idf = log(lit(1.0) +
      (col("__n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfD = col("tf").cast("double")
    val sat = tfD * lit(k1 + 1.0) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("__avgdl")))
    val contrib = (idf * sat).cast("decimal(22,7)")
    val scored = perDoc
      .join(broadcast(qterms), "word")
      .join(dfreq, "word")
      .join(dlen, idCol)
      .crossJoin(broadcast(stats))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(contrib).cast("double").as("score"),
        count(lit(1)).as("n_matched"),
        sum(col("tf")).as("tf_sum"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rank"),
        col("score"), col("n_matched"), col("tf_sum"))
  }

  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the term explode is the heavy per-row pass: fan a starved scan out
    // first (guide §2.5; operator-local per the round-19 verdict, q96
    // driver evidence)
    val dfw = Fanout.widen(df, Seq(col(idCol)))
    val terms = explodeTerms(dfw, idCol, textCol)
    val perDoc = terms.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("tf_count"))
    val docLen = Window.partitionBy(col(idCol))
    val tf = perDoc.withColumn("tf",
      col("tf_count").cast("double") / sum(col("tf_count")).over(docLen).cast("double"))
    // document frequency derives from perDoc (exactly one row per distinct
    // (doc, word) already) — recomputing via docFrequencies would re-scan
    // and re-explode the whole corpus a second time
    val dfreq = perDoc.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = dfw.agg(count(lit(1)).as("__graft_n"))
    tf.join(dfreq, "word")
      .crossJoin(broadcast(n))
      .withColumn("idf", log(col("__graft_n").cast("double") / col("df").cast("double")))
      .withColumn("score", col("tf") * col("idf"))
      .drop("__graft_n")
      .select(col(idCol), col("word"), col("tf_count"), col("df"),
        col("tf"), col("idf"), col("score"))
  }
}
