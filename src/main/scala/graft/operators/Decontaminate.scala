package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination — flag (and drop) corpus documents that share
 * any word n-gram with a probe/benchmark set. The standard guard against
 * test-set leakage when assembling training corpora: a document containing
 * a verbatim benchmark n-gram is contaminated and must not be trained on.
 *
 * Mechanics: whitespace tokens → every n-token window → md5-prefix hash of
 * the joined window (16 hex chars ≈ 64 bits — collision-safe at corpus
 * scale and portable: any md5-bearing engine recomputes the identical key,
 * which is how the battery oracle checks this in DuckDB) → hash semi-join
 * against the probe set's n-gram hashes.
 *
 * Scale shape: gram generation is a codegen'd higher-order expression (no
 * UDF, no explode until the join needs rows); the join ships only
 * (id, 16-char hash) pairs — document text never moves; the probe side is
 * a benchmark (thousands of docs), so its distinct hash set BROADCASTS and
 * the corpus side never shuffles at all. At 100 TB: one broadcast
 * hash-semi-join over a linear scan.
 */
object Decontaminate {

  /** Hashes of every `n`-token window of `textCol` (empty array when the
   *  document has fewer than `n` tokens). Native one-pass expression —
   *  value-identical to the higher-order
   *  `transform(sequence(…), i -> substring(md5(array_join(slice(…))), 1, 16))`
   *  formulation (equivalence spec-gated) but without its per-window
   *  slice/join/array allocations. */
  def gramHashes(textCol: Column, n: Int): Column = {
    require(n >= 2, "n-gram size must be >= 2")
    graft.functions.NgramMd5Hashes(textCol, n, hexLen = 16)
  }

  /** (id, gram) pairs for a document set. */
  def grams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(gramHashes(col(textCol), n)).as("gram"))

  /** Ids of corpus documents sharing at least one n-gram with the probe
   *  set. The probe's distinct gram set is small → broadcast semi-join. */
  def contaminatedIds(
      corpus: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val probeGrams = broadcast(
      probe.select(explode(gramHashes(col(textCol), n)).as("gram")).distinct())
    grams(corpus, idCol, textCol, n)
      .join(probeGrams, "gram", "left_semi")
      .select(col(idCol)).distinct()
  }

  /** The corpus minus contaminated documents (the curation action). */
  def dropContaminated(
      corpus: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame =
    corpus.join(contaminatedIds(corpus, probe, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /**
   * N-gram novelty profile — the duplication/memorization-risk metric:
   * per document, the fraction of its n-gram occurrences whose gram
   * appears in NO other document of the corpus (document frequency 1).
   * Novelty ≈ 1 is fresh content; ≈ 0 is boilerplate or copied spans —
   * the per-document complement of span dedup's corpus-wide view, used
   * to rank what duplication-driven memorization a model would see from
   * each document (Lee et al. 2022 measure duplication exactly through
   * these cross-document n-gram frequencies).
   *
   * Output: (idCol, `n_grams`, `novel_grams`, `novelty`); a document
   * shorter than `n` tokens has zero grams and novelty 1.0 (nothing to
   * duplicate).
   *
   * Scale shape: the only corpus-wide exchange carries (id, 16-char
   * gram hash) pairs — text never moves; gram document frequencies are
   * one map-side-combined aggregation of the DISTINCT (id, gram) pairs;
   * the per-document fold regroups by id. Same shuffle class as span
   * dedup, linear in corpus gram count.
   */
  def noveltyScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val g = grams(df, idCol, textCol, n)
    val dfreq = g.distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
    val per = g.join(dfreq, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") === 1, 1L).otherwise(0L)).as("novel_grams"))
    noveltyOutput(df, idCol, per)
  }

  /** Persisted artifact for incremental novelty: (gram, gdf) document
   *  frequencies over a corpus — write once per snapshot, probe per
   *  increment ([[noveltyAgainstFrequencies]]), exactly the role the
   *  signature table plays for incremental near-dup dedup. */
  def gramFrequencies(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame =
    grams(df, idCol, textCol, n).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("gdf"))

  /**
   * Novelty of NEW documents against an EXISTING corpus's persisted
   * [[gramFrequencies]]: a new doc's gram occurrence is novel iff the
   * corpus never saw the gram. The daily-increment complement of
   * [[noveltyScores]] — cost is one join of the INCREMENT's grams
   * against the frequency table (broadcast when the table fits, gram-
   * keyed shuffle otherwise), never a corpus rescan: the 100 TB corpus
   * was read once, when its frequencies were built. Same output shape
   * as [[noveltyScores]].
   */
  def noveltyAgainstFrequencies(
      newDocs: DataFrame,
      freqs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val per = grams(newDocs, idCol, textCol, n)
      .join(freqs.select(col("gram")).withColumn("__seen", lit(1)),
        Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("novel_grams"))
    noveltyOutput(newDocs, idCol, per)
  }

  /** Shared tail: re-attach zero-gram (shorter than n tokens) documents
   *  with novelty 1.0 and emit the (id, n_grams, novel_grams, novelty)
   *  contract. */
  private def noveltyOutput(
      df: DataFrame, idCol: String, per: DataFrame): DataFrame =
    df.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"),
        when(col("n_grams").isNull, lit(1.0))
          .otherwise(col("novel_grams").cast("double") /
            col("n_grams").cast("double")).as("novelty"))
}
