package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-based language-model scoring — the CCNet selection loop (Wenzek et
 * al. 2020: train an LM on a reference corpus, score every candidate
 * document, select by score bucket), re-expressed with engine-portable
 * exact arithmetic.
 *
 * Honesty note: CCNet proper scores with a 5-gram KenLM perplexity. A
 * perplexity needs `log`/`exp`, whose last-ulp behavior differs across
 * engines — a hash-checked oracle would be flaky by construction. This
 * operator keeps the ARCHITECTURE (train counts once → broadcast/plan-
 * literal model → score at scan speed → bucket by thresholds) and scores
 * with rational statistics instead, each a SINGLE division of exact
 * integer sums so any engine reproduces the doubles bit-for-bit:
 *  - `lm_score`: mean add-one token probability under the trained unigram
 *    model, `(Σ_tok c(tok) + n) / (n · (N + V))`;
 *  - `lm_oov_frac`: fraction of tokens outside the (possibly capped)
 *    vocabulary, `oov / n`;
 *  - `lm_bigram_hit_frac`: fraction of adjacent token pairs attested in
 *    the trained bigram table, `hits / (n - 1)` — the higher-order signal
 *    as exact membership rather than a smoothed conditional.
 *
 * 100 TB shape: training is one map-side-combined count aggregation per
 * order; the model rides either as a plan-literal map (≤
 * `maxBroadcastTerms`, zero exchanges on the corpus — the
 * [[TextAnalysis.scoreLinear]] discipline) or as a broadcast join on
 * exploded (id, term) rows with integer partial aggregation (narrow rows,
 * corpus text never shuffles). Bucketing compares against FIXED
 * boundaries (CCNet derives them from a profiled sample) — pure codegen,
 * no global sort, no single-partition window.
 */
object CountLm {

  /** Trained model: capped term/bigram count tables plus the totals the
   *  smoothing denominator needs. `totalTokens`/`vocabSize` describe the
   *  CAPPED vocabulary (self-consistent with `terms`). */
  final case class Model(
      terms: DataFrame,   // (term: string, cnt: long)
      bigrams: DataFrame, // (bg: string, cnt: long)
      totalTokens: Long,
      vocabSize: Long)

  private def toks(text: Column): Column = split(text, " ")

  /**
   * Distributed top-`k` of a `(key, cnt)` count table by
   * `(cnt desc, key asc)` — the vocabulary head cut.
   *
   * A bare `row_number().over(Window.orderBy(...))` has no partition key:
   * Spark moves EVERY distinct term — billions of bigrams at web scale —
   * into ONE partition to rank it. This delegates to
   * [[Sampling.topKByOrder]] instead (TakeOrderedAndProject for
   * broadcast-scale `k`, plan-gated in PlanQualitySpec; two-pass
   * range-exchange cut past the engine's top-K threshold) — never a
   * single-partition sort.
   */
  def capTopK(counts: DataFrame, key: String, k: Int): DataFrame =
    Sampling.topKByOrder(counts, k, Seq(col("cnt").desc, col(key).asc))

  /** Train unigram + bigram counts from `corpus.textCol` (space-tokenized,
   *  the engine-wide convention). `maxVocab > 0` keeps the top terms and
   *  bigrams by `(count desc, value asc)` — the head-truncation every real
   *  LM applies, with a deterministic tie-break — via the distributed
   *  [[capTopK]] (never a single-partition global window). */
  def train(corpus: DataFrame, textCol: String, maxVocab: Int = 0): Model = {
    val t = toks(col(textCol))
    def cap(df: DataFrame, key: String): DataFrame =
      if (maxVocab <= 0) df else capTopK(df, key, maxVocab)
    val terms = cap(
      corpus.select(explode(t).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt")), "term")
      .localCheckpoint(eager = true)
    val bigrams = cap(
      corpus.select(explode(
          when(size(t) >= 2,
            transform(sequence(lit(1), size(t) - 1),
              i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
            .otherwise(array().cast("array<string>"))).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cnt")), "bg")
      .localCheckpoint(eager = true)
    val totals = terms.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("n"),
      count(lit(1)).as("v")).head()
    Model(terms, bigrams, totals.getLong(0), totals.getLong(1))
  }

  /**
   * Score every document under `model`, appending `lm_score`,
   * `lm_oov_frac`, `lm_bigram_hit_frac`. Models at or under
   * `maxBroadcastTerms` entries ride as plan-literal maps — zero
   * exchanges on the corpus (plan-gated); larger models switch to the
   * broadcast-join strategy of [[scoreJoin]].
   */
  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model,
      maxBroadcastTerms: Int = 100000): DataFrame = {
    val nTerms = model.terms.count()
    val nBigrams = model.bigrams.count()
    if (nTerms <= maxBroadcastTerms && nBigrams <= maxBroadcastTerms) {
      val termMap = typedLit(
        model.terms.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      val bgMap = typedLit(
        model.bigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      val t = toks(col(textCol))
      val n = size(t).cast("long")
      val sumC = aggregate(t, lit(0L),
        (acc, w) => acc + coalesce(element_at(termMap, w), lit(0L)))
      val oov = aggregate(t, lit(0L),
        (acc, w) => acc + when(element_at(termMap, w).isNull, 1L).otherwise(0L))
      val hits = when(n >= 2, aggregate(sequence(lit(1), (n - 1).cast("int")),
          lit(0L),
          (acc, i) => acc + when(element_at(bgMap,
            concat_ws(" ", element_at(t, i), element_at(t, i + 1))).isNotNull,
            1L).otherwise(0L)))
        .otherwise(lit(0L))
      df.withColumn("lm_score",
          when(n === 0, lit(0.0)).otherwise(
            (sumC + n).cast("double") /
              (n * lit(model.totalTokens + model.vocabSize)).cast("double")))
        .withColumn("lm_oov_frac",
          when(n === 0, lit(0.0)).otherwise(oov.cast("double") / n.cast("double")))
        .withColumn("lm_bigram_hit_frac",
          when(n < 2, lit(0.0)).otherwise(
            hits.cast("double") / (n - 1).cast("double")))
    } else scoreJoin(df, idCol, textCol, model)
  }

  /** Join-strategy scoring for models past the plan-literal threshold:
   *  exploded (id, term)/(id, bigram) rows broadcast-join the model
   *  tables, integer partial sums regroup per document, and the corpus
   *  rejoins by id — text never shuffles, every exchanged row is
   *  (id, long). Identical output to the literal path (spec-gated). */
  def scoreJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame = {
    val t = toks(col(textCol))
    val termRows = df.select(col(idCol).as("__graft_lm_id"),
        explode(t).as("term"))
      .join(broadcast(model.terms), Seq("term"), "left")
      .groupBy(col("__graft_lm_id"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("cnt")), lit(0L)).as("sumC"),
        count(when(col("cnt").isNull, 1)).as("oov"))
    val bgRows = df.select(col(idCol).as("__graft_lm_id"),
        explode(when(size(t) >= 2,
          transform(sequence(lit(1), size(t) - 1),
            i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
          .otherwise(array().cast("array<string>"))).as("bg"))
      .join(broadcast(model.bigrams), Seq("bg"), "left_semi")
      .groupBy(col("__graft_lm_id"))
      .agg(count(lit(1)).as("hits"))
    val stats = termRows.join(bgRows, Seq("__graft_lm_id"), "left")
    df.join(stats, df(idCol) === stats("__graft_lm_id"), "left")
      .withColumn("lm_score",
        when(col("n").isNull || col("n") === 0, lit(0.0)).otherwise(
          (col("sumC") + col("n")).cast("double") /
            (col("n") * lit(model.totalTokens + model.vocabSize)).cast("double")))
      .withColumn("lm_oov_frac",
        when(col("n").isNull || col("n") === 0, lit(0.0))
          .otherwise(col("oov").cast("double") / col("n").cast("double")))
      .withColumn("lm_bigram_hit_frac",
        when(col("n").isNull || col("n") < 2, lit(0.0)).otherwise(
          coalesce(col("hits"), lit(0L)).cast("double") /
            (col("n") - 1).cast("double")))
      .drop("__graft_lm_id", "n", "sumC", "oov", "hits")
  }

  /** Mean add-one token probability under a term map — the `lm_score`
   *  statistic alone, shared by the DSIR weighting below (no bigram work). */
  private def unigramScoreCol(
      t: Column, termMap: Column, totalTokens: Long, vocabSize: Long): Column = {
    val n = size(t).cast("long")
    val sumC = aggregate(t, lit(0L),
      (acc, w) => acc + coalesce(element_at(termMap, w), lit(0L)))
    when(n === 0, lit(0.0)).otherwise(
      (sumC + n).cast("double") /
        (n * lit(totalTokens + vocabSize)).cast("double"))
  }

  /**
   * DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score every candidate
   * under a TARGET-domain model and a RAW-pool model and weight by the
   * ratio — documents that look more like the target than like the pool
   * rank up. DSIR proper builds hashed-bigram multinomials and resamples
   * with Gumbel noise on the log-ratio; this keeps the architecture (two
   * count models trained once on their corpora, candidates scored at scan
   * speed) with the engine's rational statistics: `weight =
   * lm_score_target / lm_score_raw`, one IEEE division of two
   * already-exact scores, so any engine reproduces the doubles
   * bit-for-bit. (The noisy resampling variant is one Gumbel column away;
   * left out so selection stays an exact-oracle ranking.) Both term maps
   * ride as plan literals — zero exchanges on the candidate corpus
   * (plan-gated); models past `maxBroadcastTerms` fall back to two
   * [[scoreJoin]] passes whose integer partial sums are order-free, so
   * the weights are identical (spec-gated).
   */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      target: Model,
      raw: Model,
      maxBroadcastTerms: Int = 100000,
      outCol: String = "dsir_weight"): DataFrame = {
    def ratio(st: Column, sr: Column): Column =
      when(sr === 0.0, lit(0.0)).otherwise(st / sr)
    if (target.terms.count() <= maxBroadcastTerms &&
        raw.terms.count() <= maxBroadcastTerms) {
      def termMap(m: Model): Column = typedLit(
        m.terms.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      val t = toks(col(textCol))
      df.withColumn(outCol, ratio(
        unigramScoreCol(t, termMap(target), target.totalTokens, target.vocabSize),
        unigramScoreCol(t, termMap(raw), raw.totalTokens, raw.vocabSize)))
    } else {
      val st = scoreJoin(df, idCol, textCol, target)
        .withColumnRenamed("lm_score", "__graft_dsir_t")
        .drop("lm_oov_frac", "lm_bigram_hit_frac")
      scoreJoin(st, idCol, textCol, raw)
        .withColumn(outCol, ratio(col("__graft_dsir_t"), col("lm_score")))
        .drop("__graft_dsir_t", "lm_score", "lm_oov_frac", "lm_bigram_hit_frac")
    }
  }

  /** DSIR selection: the `k` most target-like candidates by
   *  `(dsir_weight desc, id asc)` — [[Sampling.topKByOrder]], so the scored
   *  corpus is never globally sorted into one partition. */
  def selectByImportance(
      df: DataFrame,
      idCol: String,
      textCol: String,
      target: Model,
      raw: Model,
      k: Int,
      maxBroadcastTerms: Int = 100000): DataFrame =
    Sampling.topKByOrder(
      importanceWeights(df, idCol, textCol, target, raw, maxBroadcastTerms),
      k, Seq(col("dsir_weight").desc, col(idCol).asc))

  /** CCNet-style selection: assign each row a bucket label by comparing
   *  `scoreCol` against ascending `boundaries` (score < b₀ → labels(0),
   *  < b₁ → labels(1), …, else labels.last). Fixed thresholds — derived
   *  from a profiled sample upstream, the way CCNet cuts head/middle/tail
   *  — so the assignment is pure codegen with no global sort. */
  def withScoreBuckets(
      df: DataFrame,
      scoreCol: String,
      boundaries: Seq[Double],
      labels: Seq[String],
      outCol: String = "lm_bucket"): DataFrame = {
    require(labels.size == boundaries.size + 1,
      s"need ${boundaries.size + 1} labels for ${boundaries.size} boundaries")
    require(boundaries == boundaries.sorted, "boundaries must ascend")
    val expr = boundaries.zip(labels).foldRight(lit(labels.last)) {
      case ((b, l), acc) => when(col(scoreCol) < b, lit(l)).otherwise(acc)
    }
    df.withColumn(outCol, expr)
  }
}
