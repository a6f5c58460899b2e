package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountLmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat"),
    (2L, "the dog sat"),
    (3L, "the cat ran"))
    .toDF("doc_id", "text")

  test("train: counts, totals, deterministic vocab cap") {
    val m = CountLm.train(corpus, "text")
    val terms = m.terms.as[(String, Long)].collect().toMap
    // the×3, cat×2, sat×2, dog×1, ran×1
    assert(terms === Map("the" -> 3L, "cat" -> 2L, "sat" -> 2L,
      "dog" -> 1L, "ran" -> 1L))
    assert(m.totalTokens === 9L && m.vocabSize === 5L)
    val bgs = m.bigrams.as[(String, Long)].collect().toMap
    assert(bgs === Map("the cat" -> 2L, "the dog" -> 1L, "cat sat" -> 1L,
      "dog sat" -> 1L, "cat ran" -> 1L))
    // cap keeps top-k by (cnt desc, value asc): k=2 → the, cat
    val capped = CountLm.train(corpus, "text", maxVocab = 2)
    assert(capped.terms.as[(String, Long)].collect().toMap ===
      Map("the" -> 3L, "cat" -> 2L))
    assert(capped.totalTokens === 5L && capped.vocabSize === 2L)
  }

  test("score: hand-computed mean add-one probability, oov, bigram hits") {
    val m = CountLm.train(corpus, "text") // N=9, V=5 → denom base 14
    val docs = Seq(
      (10L, "the cat sat"),   // sumC=3+2+2=7, n=3 → (7+3)/(3·14)=10/42
      (11L, "zebra the"),     // sumC=0+3=3, n=2, oov=1 → (3+2)/(2·14)=5/28
      (12L, "zebra"))         // all-oov single token → (0+1)/(1·14)
      .toDF("doc_id", "text")
    val got = CountLm.score(docs, "doc_id", "text", m)
      .select("doc_id", "lm_score", "lm_oov_frac", "lm_bigram_hit_frac")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(10L) === ((10.0 / 42, 0.0, 1.0)))   // both bigrams attested
    assert(got(11L) === ((5.0 / 28, 1.0 / 2, 0.0))) // "zebra the" unattested
    assert(got(12L) === ((1.0 / 14, 1.0, 0.0)))     // n<2 → bigram frac 0
  }

  test("scoreJoin is output-identical to the literal-map path") {
    val m = CountLm.train(corpus, "text")
    val docs = Seq(
      (10L, "the cat sat"), (11L, "zebra the"), (12L, "zebra"),
      (13L, "the dog sat the dog sat"))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lm_score", "lm_oov_frac", "lm_bigram_hit_frac")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(canon(CountLm.scoreJoin(docs, "doc_id", "text", m)) ===
      canon(CountLm.score(docs, "doc_id", "text", m)))
  }

  test("withScoreBuckets: boundary comparisons, head/middle/tail") {
    val df = Seq((1L, 0.1), (2L, 0.5), (3L, 0.9)).toDF("doc_id", "s")
    val got = CountLm.withScoreBuckets(df, "s", Seq(0.3, 0.7),
        Seq("tail", "middle", "head"))
      .select("doc_id", "lm_bucket").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "tail", 2L -> "middle", 3L -> "head"))
  }

  test("capTopK: both paths agree with a local sort, incl. past the top-K threshold") {
    // 200 keys, zipf-ish counts with heavy ties so the (cnt desc, key asc)
    // tie-break is actually exercised at the cut boundary
    val counts = (0 until 200).map(i => (f"t$i%03d", (i % 7).toLong + 1L))
      .toDF("term", "cnt").repartition(8)
    val expected = counts.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (k, c) => (-c, k) }
    def got(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long)].collect().sortBy { case (k, c) => (-c, k) }.toSeq
    for (k <- Seq(1, 13, 50, 200, 500)) {
      assert(got(CountLm.capTopK(counts, "term", k)) ===
        expected.take(k).toSeq, s"TakeOrdered path, k=$k")
    }
    // force the large-k path (range-exchange two-pass) by shrinking the
    // engine threshold — scoped, restored in finally
    val conf = "spark.sql.execution.topKSortFallbackThreshold"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "10")
      for (k <- Seq(13, 50, 200))
        assert(got(CountLm.capTopK(counts, "term", k)) ===
          expected.take(k).toSeq, s"two-pass path, k=$k")
    } finally spark.conf.set(conf, prev)
  }

  test("importanceWeights: hand-computed target/raw ratio; join fallback identical") {
    val target = CountLm.train(Seq((1L, "the cat sat")).toDF("doc_id", "text"), "text")
    val raw = CountLm.train(corpus, "text") // N=9, V=5 → base 14
    val cands = Seq((10L, "the cat ran"), (11L, "zebra"), (12L, ""))
      .toDF("doc_id", "text")
    val got = CountLm.importanceWeights(cands, "doc_id", "text", target, raw)
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    // target: N=3, V=3 → base 6; "the cat ran": sumC_T=1+1+0=2, n=3 → 5/18
    // raw: sumC_R=3+2+1=6 → 9/42; weight computed the code's way
    assert(got(10L) === (5.0 / 18.0) / (9.0 / 42.0))
    // all-oov single token: T → 1/6, R → 1/14
    assert(got(11L) === (1.0 / 6.0) / (1.0 / 14.0))
    // "" tokenizes to ONE empty token (the engine-wide split convention,
    // identical to score()) — an all-OOV singleton, same weight as zebra
    assert(got(12L) === got(11L))
    // broadcast-join fallback (maxBroadcastTerms = 0) reproduces the
    // literal-map doubles bit-for-bit (integer partial sums are order-free)
    val viaJoin = CountLm.importanceWeights(cands, "doc_id", "text", target, raw,
        maxBroadcastTerms = 0)
      .select("doc_id", "dsir_weight").as[(Long, Double)].collect().toMap
    assert(viaJoin === got)
  }

  test("selectByImportance: deterministic top-k by (weight desc, id asc)") {
    val target = CountLm.train(Seq((1L, "the cat sat")).toDF("doc_id", "text"), "text")
    val raw = CountLm.train(corpus, "text")
    // hand-ranked: zebra (all-OOV singleton, add-one smoothing under the
    // tiny target vocab inflates it) 14/6·… = 2.33 > "the cat sat" twins
    // (6/18)/(10/42) = 1.4 > "the cat ran" (5/18)/(9/42) ≈ 1.296
    val cands = Seq((10L, "the cat sat"), (11L, "the cat ran"),
      (12L, "zebra"), (13L, "the cat sat"))
      .toDF("doc_id", "text")
    val top3 = CountLm.selectByImportance(cands, "doc_id", "text", target, raw, k = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(top3 == Seq(10L, 12L, 13L)) // 11 is the one excluded
    // the 1.4-weight tie between 10 and 13 breaks by id asc at k = 2
    val top2 = CountLm.selectByImportance(cands, "doc_id", "text", target, raw, k = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(top2 == Seq(10L, 12L))
  }

  test("literal-map scoring is zero-exchange on the corpus (plan gate)") {
    val m = CountLm.train(corpus, "text")
    val plan = CountLm.score(corpus, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"plan-literal LM must score at scan speed:\n$plan")
  }

  test("deriveKn: marginals of the capped bigram table, hand-checked") {
    // corpus "a b a" twice → bigrams: "a b"×2, "b a"×2
    val c = Seq((1L, "a b a"), (2L, "a b a")).toDF("doc_id", "text")
    val kn = CountLm.deriveKn(CountLm.train(c, "text"))
    val ctx = kn.contexts.as[(String, Long, Long)].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(ctx === Map("a" -> ((2L, 1L)), "b" -> ((2L, 1L))))
    assert(kn.rights.as[(String, Long)].collect().toMap ===
      Map("a" -> 1L, "b" -> 1L))
    assert(kn.bigramTypes === 2L && kn.rightTypes === 2L)
  }

  test("scoreKn: hand-computed interpolated KN log-probability") {
    // model: "a b a" → bigrams "a b"×1, "b a"×1; ctx a→(1,1), b→(1,1);
    // rights a→1, b→1; B=2, R=2 → B+R=4
    val kn = CountLm.deriveKn(CountLm.train(
      Seq((1L, "a b a")).toDF("doc_id", "text"), "text"))
    val scored = CountLm.scoreKn(
      Seq((1L, "a b c"), (2L, "x"), (3L, "z q")).toDF("doc_id", "text"),
      "doc_id", "text", kn)
      .select($"doc_id", $"kn_logprob", $"kn_bigrams")
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    // doc 1: (a,b) seen: pcont(b)=(1+1)/4=0.5, p=(0.25+0.75·1·0.5)/1=0.625
    //        (b,c) ctx seen, bigram unseen: pcont(c)=(0+1)/4=0.25,
    //              p=(0+0.75·1·0.25)/1=0.1875
    val expect1 = BigDecimal(math.log(0.625)).setScale(7, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(math.log(0.1875)).setScale(7, BigDecimal.RoundingMode.HALF_UP)
    assert(scored(0)._2 === expect1.toDouble && scored(0)._3 === 2L)
    // doc 2: no bigrams → 0.0
    assert(scored(1)._2 === 0.0 && scored(1)._3 === 0L)
    // doc 3: (z,q) unseen ctx → backoff pcont(q)=(0+1)/4=0.25
    val expect3 = BigDecimal(math.log(0.25)).setScale(7, BigDecimal.RoundingMode.HALF_UP)
    assert(scored(2)._2 === expect3.toDouble && scored(2)._3 === 1L)
  }

  test("scoreKnJoin is bit-identical to the literal path; literal path zero-exchange") {
    val c = (0L until 60L).map(i =>
      (i, s"w${i % 7} w${i % 5} w${i % 3} common end${i % 2}"))
      .toDF("doc_id", "text")
    val kn = CountLm.deriveKn(CountLm.train(c.filter($"doc_id" < 20L), "text"))
    def collectOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"kn_logprob", $"kn_bigrams")
        .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val lit = CountLm.scoreKn(c, "doc_id", "text", kn)
    val join = CountLm.scoreKnJoin(c, "doc_id", "text", kn)
    assert(collectOf(lit) == collectOf(join))
    val plan = lit.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"plan-literal KN must score at scan speed:\n$plan")
  }
}
