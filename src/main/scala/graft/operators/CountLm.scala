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
    // the two explode+count passes below are heavy per-row work over the
    // whole corpus: fan a starved single-file scan out first (guide §2.5;
    // operator-local per the round-19 verdict, q151 2x driver evidence)
    val c = Fanout.widen(corpus, Seq(col(textCol)))
    val t = toks(col(textCol))
    def cap(df: DataFrame, key: String): DataFrame =
      if (maxVocab <= 0) df else capTopK(df, key, maxVocab)
    val terms = cap(
      c.select(explode(t).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt")), "term")
      .localCheckpoint(eager = true)
    val bigrams = cap(
      c.select(explode(
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
    // per-row token folds below are heavy: fan a starved scan out first
    // (guide §2.5; operator-local, round-19 q157 evidence)
    val dfw = Fanout.widen(df, Seq(col(idCol)))
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
      dfw.withColumn("lm_score",
          when(n === 0, lit(0.0)).otherwise(
            (sumC + n).cast("double") /
              (n * lit(model.totalTokens + model.vocabSize)).cast("double")))
        .withColumn("lm_oov_frac",
          when(n === 0, lit(0.0)).otherwise(oov.cast("double") / n.cast("double")))
        .withColumn("lm_bigram_hit_frac",
          when(n < 2, lit(0.0)).otherwise(
            hits.cast("double") / (n - 1).cast("double")))
    } else scoreJoin(dfw, idCol, textCol, model)
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
    val dfw = Fanout.widen(df, Seq(col(idCol)))
    if (target.terms.count() <= maxBroadcastTerms &&
        raw.terms.count() <= maxBroadcastTerms) {
      def termMap(m: Model): Column = typedLit(
        m.terms.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      val t = toks(col(textCol))
      dfw.withColumn(outCol, ratio(
        unigramScoreCol(t, termMap(target), target.totalTokens, target.vocabSize),
        unigramScoreCol(t, termMap(raw), raw.totalTokens, raw.vocabSize)))
    } else {
      val st = scoreJoin(dfw, idCol, textCol, target)
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

  /**
   * Derived statistics for interpolated Kneser-Ney scoring, computed
   * entirely from the trained bigram table (self-consistent under a
   * capped vocabulary — marginals of the CAPPED table, not raw corpus
   * counts):
   *  - `contexts`: per left word w1, `ctot` = Σ c(w1 ·) and `ncont` =
   *    N1+(w1 ·) (distinct continuations);
   *  - `rights`: per right word w2, `nleft` = N1+(· w2) (distinct left
   *    contexts) — the Kneser-Ney continuation count;
   *  - `bigramTypes` / `rightTypes`: distinct bigram / right-word type
   *    totals, the continuation-distribution denominators.
   */
  final case class KnModel(
      bigrams: DataFrame,  // (bg: string, cnt: long)
      contexts: DataFrame, // (w1: string, ctot: long, ncont: long)
      rights: DataFrame,   // (w2: string, nleft: long)
      bigramTypes: Long,
      rightTypes: Long)

  /** One aggregation pass over the (already counted, possibly capped)
   *  bigram table — never over the corpus. */
  def deriveKn(model: Model): KnModel = {
    val parts = model.bigrams.select(col("bg"), col("cnt"),
      split(col("bg"), " ").as("w"))
      .select(col("bg"), col("cnt"),
        element_at(col("w"), 1).as("w1"), element_at(col("w"), 2).as("w2"))
    val contexts = parts.groupBy(col("w1")).agg(
      sum(col("cnt")).as("ctot"), count(lit(1)).as("ncont"))
      .localCheckpoint(eager = true)
    val rights = parts.groupBy(col("w2")).agg(count(lit(1)).as("nleft"))
      .localCheckpoint(eager = true)
    val totals = parts.agg(count(lit(1)).as("b"),
      count_distinct(col("w2")).as("r")).head()
    KnModel(model.bigrams, contexts, rights, totals.getLong(0), totals.getLong(1))
  }

  /**
   * Interpolated Kneser-Ney bigram log-probability per document — the
   * ACTUAL CCNet/KenLM scoring shape (Kneser & Ney 1995; CCNet scores
   * with a KN-smoothed KenLM), engine-reproducible despite the `ln`:
   *
   *   P(w2|w1) = (max(c(w1w2) − D, 0) + D · N1+(w1·) · Pc(w2)) / c(w1·)
   *   unseen w1 → Pc(w2);   Pc(w2) = (N1+(·w2) + 1) / (B + R)   (add-one)
   *
   * with D = 0.75. Appended: `kn_logprob` = Σ ln P over adjacent bigrams
   * and `kn_bigrams` = the bigram count. Each per-bigram ln is a double
   * in a FIXED expression order, rounded to DECIMAL(22,7) BEFORE the sum
   * — the q142/BM25 discipline: the rounding absorbs any last-ulp
   * cross-engine `ln` wobble, and the decimal sum is exact and
   * order-independent, so the total is bit-reproducible from the counts
   * alone.
   *
   * Physical shape mirrors [[score]]: models at or under
   * `maxBroadcastTerms` ride as plan literals and the whole score is one
   * per-row array fold — ZERO corpus exchanges; larger models take
   * [[scoreKnJoin]] (exploded narrow rows, broadcast joins, decimal
   * partial sums — text never shuffles). Paths are bit-identical
   * (spec-gated).
   */
  def scoreKn(
      df: DataFrame,
      idCol: String,
      textCol: String,
      kn: KnModel,
      maxBroadcastTerms: Int = 100000): DataFrame = {
    val dfw = Fanout.widen(df, Seq(col(idCol)))
    val nBg = kn.bigrams.count()
    val nCtx = kn.contexts.count()
    if (nBg <= maxBroadcastTerms && nCtx <= maxBroadcastTerms) {
      val bgMap = typedLit(
        kn.bigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      val ctxMap = typedLit(kn.contexts.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap)
      val rightMap = typedLit(
        kn.rights.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      val t = toks(col(textCol))
      val n = size(t).cast("long")
      def termAt(i: Column): Column = {
        val w1 = element_at(t, i)
        val w2 = element_at(t, i + 1)
        val bg = concat_ws(" ", w1, w2)
        knTerm(element_at(bgMap, bg),
          element_at(ctxMap, w1).getField("_1"),
          element_at(ctxMap, w1).getField("_2"),
          element_at(rightMap, w2),
          kn.bigramTypes, kn.rightTypes)
      }
      val total = when(n >= 2,
          aggregate(sequence(lit(1), (n - 1).cast("int")),
            lit(java.math.BigDecimal.ZERO).cast("decimal(22,7)"),
            (acc, i) => (acc + termAt(i)).cast("decimal(22,7)")))
        .otherwise(lit(java.math.BigDecimal.ZERO).cast("decimal(22,7)"))
      dfw.withColumn("kn_logprob", total.cast("double"))
        .withColumn("kn_bigrams", greatest(n - 1, lit(0L)))
    } else scoreKnJoin(dfw, idCol, textCol, kn)
  }

  /** The per-bigram DECIMAL(22,7) ln-probability term, shared verbatim by
   *  both physical paths (and replayed by the q157 oracle): every input
   *  is a nullable count column, D = 0.75, add-one continuation floor. */
  private def knTerm(
      c: Column, ctot: Column, ncont: Column, nleft: Column,
      bigramTypes: Long, rightTypes: Long): Column = {
    val pcont = (coalesce(nleft, lit(0L)) + lit(1L)).cast("double") /
      lit(bigramTypes + rightTypes).cast("double")
    val p = when(ctot.isNull, pcont).otherwise(
      (greatest(coalesce(c, lit(0L)).cast("double") - lit(0.75), lit(0.0)) +
        lit(0.75) * ncont.cast("double") * pcont) / ctot.cast("double"))
    log(p).cast("decimal(22,7)")
  }

  /** Join-strategy Kneser-Ney for models past the plan-literal threshold:
   *  (id, w1, w2) rows broadcast-join the three stat tables, the decimal
   *  terms partial-sum per document (exact, order-free), and the corpus
   *  rejoins by id — every exchanged row is narrow, text never shuffles. */
  def scoreKnJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      kn: KnModel): DataFrame = {
    val t = toks(col(textCol))
    val pairs = df.select(col(idCol).as("__graft_kn_id"),
      explode(when(size(t) >= 2,
        transform(sequence(lit(1), size(t) - 1),
          i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("p"))
      .select(col("__graft_kn_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val scored = pairs
      .join(broadcast(kn.bigrams
        .select(split(col("bg"), " ").as("w"), col("cnt"))
        .select(element_at(col("w"), 1).as("w1"),
          element_at(col("w"), 2).as("w2"), col("cnt"))), Seq("w1", "w2"), "left")
      .join(broadcast(kn.contexts), Seq("w1"), "left")
      .join(broadcast(kn.rights), Seq("w2"), "left")
      .select(col("__graft_kn_id"),
        knTerm(col("cnt"), col("ctot"), col("ncont"), col("nleft"),
          kn.bigramTypes, kn.rightTypes).as("term"))
      .groupBy(col("__graft_kn_id"))
      .agg(sum(col("term")).cast("decimal(22,7)").as("kn_sum"),
        count(lit(1)).as("kn_n"))
    df.join(scored, df(idCol) === scored("__graft_kn_id"), "left")
      .withColumn("kn_logprob",
        coalesce(col("kn_sum").cast("double"), lit(0.0)))
      .withColumn("kn_bigrams", coalesce(col("kn_n"), lit(0L)))
      .drop("__graft_kn_id", "kn_sum", "kn_n")
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
