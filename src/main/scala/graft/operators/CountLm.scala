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
   * into ONE partition to rank it. Neither path here ever does that:
   *  - `k` at or under the engine's top-K threshold (the common case: a
   *    vocabulary cap must stay broadcast-scale anyway) plans as
   *    `TakeOrderedAndProject` — each partition keeps a k-bounded priority
   *    queue and the driver streams the per-partition queues into one
   *    merged queue of ≤ k narrow `(key, cnt)` rows. No exchange at all;
   *    plan-gated by PlanQualitySpec.
   *  - larger `k` reuses [[Sampling.takeByBudget]]'s two-pass
   *    range-exchange prefix sum with unit cost: one range shuffle on the
   *    order, per-partition row counts broadcast as start offsets, and
   *    partitions whose offset already exceeds `k` short-circuit without
   *    reading a row.
   */
  def capTopK(counts: DataFrame, key: String, k: Int): DataFrame = {
    require(k > 0, s"capTopK needs a positive k, got $k")
    val order = Seq(col("cnt").desc, col(key).asc)
    if (k <= counts.sparkSession.sessionState.conf.topKSortFallbackThreshold)
      counts.sort(order: _*).limit(k)
    else
      Sampling.takeByBudget(
          counts.withColumn("__graft_lm_one", lit(1L)),
          "__graft_lm_one", k.toLong, order)
        .drop("__graft_lm_one", "cum_cost")
  }

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
