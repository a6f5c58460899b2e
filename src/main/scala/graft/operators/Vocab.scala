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
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = explodeTerms(df, idCol, textCol)
    val perDoc = terms.groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("tf_count"))
    val docLen = Window.partitionBy(col(idCol))
    val tf = perDoc.withColumn("tf",
      col("tf_count").cast("double") / sum(col("tf_count")).over(docLen).cast("double"))
    // document frequency derives from perDoc (exactly one row per distinct
    // (doc, word) already) — recomputing via docFrequencies would re-scan
    // and re-explode the whole corpus a second time
    val dfreq = perDoc.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__graft_n"))
    tf.join(dfreq, "word")
      .crossJoin(broadcast(n))
      .withColumn("idf", log(col("__graft_n").cast("double") / col("df").cast("double")))
      .withColumn("score", col("tf") * col("idf"))
      .drop("__graft_n")
      .select(col(idCol), col("word"), col("tf_count"), col("df"),
        col("tf"), col("idf"), col("score"))
  }
}
