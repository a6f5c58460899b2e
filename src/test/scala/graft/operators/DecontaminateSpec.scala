package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "a completely different sentence with no overlap at all here"),
    (3L, "prefix words then the quick brown fox jumps over the lazy dog"),
    (4L, "short doc"),
    (5L, "the quick brown fox jumps over a different dog entirely now")
  ).toDF("doc_id", "text")

  private val probe = Seq(
    (100L, "benchmark question the quick brown fox jumps over the lazy dog answer")
  ).toDF("doc_id", "text")

  test("native ngram_md5_hashes is value-identical to the higher-order md5 formulation") {
    val toks = split(col("text"), " ")
    def reference(n: Int) = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => substring(md5(array_join(slice(toks, i, lit(n)), " ")), 1, 16)))
      .otherwise(array().cast("array<string>"))
    // corpus plus nasty shapes: empty tokens (double space), leading/trailing
    // space, unicode multi-byte text, single word, empty string
    val hard = Seq((10L, "a  b c d"), (11L, " x y "), (12L, "héllo wörld déjà vu über naïve"),
      (13L, "one"), (14L, "")).toDF("doc_id", "text")
    for (n <- Seq(2, 3, 8)) {
      val diff = corpus.unionByName(hard)
        .select(col("doc_id"),
          Decontaminate.gramHashes(col("text"), n).as("fast"),
          reference(n).as("slow"))
        .filter(not(col("fast") === col("slow")))
      assert(diff.count() == 0, s"n=$n: ${diff.collect().mkString(";")}")
    }
  }

  test("gramHashes: count and determinism; short docs yield no grams") {
    val n8 = corpus.select(col("doc_id"), size(Decontaminate.gramHashes(col("text"), 8)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(n8(1L) == 3, "10 tokens -> 3 distinct 8-token windows")
    assert(n8(4L) == 0, "fewer tokens than n -> no grams")
    // identical text segment produces identical hashes (the join key works)
    val h1 = corpus.filter($"doc_id" === 1L)
      .select(explode(Decontaminate.gramHashes(col("text"), 8))).as[String].collect().toSet
    val h3 = corpus.filter($"doc_id" === 3L)
      .select(explode(Decontaminate.gramHashes(col("text"), 8))).as[String].collect().toSet
    assert((h1 & h3).nonEmpty, "shared 8-gram must hash identically in both docs")
  }

  test("contaminatedIds finds exactly the docs sharing an 8-gram with the probe") {
    val ids = Decontaminate.contaminatedIds(corpus, probe, "doc_id", "text", 8)
      .as[Long].collect().toSet
    // docs 1 and 3 contain "the quick brown fox jumps over the lazy" /
    // "quick brown fox jumps over the lazy dog" verbatim; doc 5 diverges
    // at token 7 so no 8-token window survives; 2 and 4 are clean
    assert(ids == Set(1L, 3L))
  }

  test("dropContaminated removes them and keeps everything else") {
    val kept = Decontaminate.dropContaminated(corpus, probe, "doc_id", "text", 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 5L))
  }

  test("probe side broadcasts (corpus never shuffles for the semi-join)") {
    val plan = Decontaminate.contaminatedIds(corpus, probe, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast semi-join:\n$plan")
  }

  test("noveltyScores: duplicated docs collapse, fresh docs stay 1.0, short docs default") {
    val c = Seq(
      (1L, "a b c d e f g h i j"),       // shares grams with 2 → novelty 0
      (2L, "a b c d e f g h i j"),       // exact duplicate
      (3L, "k l m n o p q r s t"),       // unique → novelty 1.0
      (4L, "x y z"),                     // < 8 tokens → no grams, novelty 1.0
      (5L, "w w w w w w w w w w w w"))   // self-repeated gram, single doc → novel
      .toDF("doc_id", "text")
    val got = Decontaminate.noveltyScores(c, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 0L, 0.0)))  // 10 tokens → 3 grams, all shared
    assert(got(2L) == ((2L, 3L, 0L, 0.0)))
    assert(got(3L) == ((3L, 3L, 3L, 1.0)))
    assert(got(4L) == ((4L, 0L, 0L, 1.0)))
    // within-doc repetition is NOT cross-document duplication: df stays 1
    assert(got(5L)._4 == 1.0 && got(5L)._2 == 5L)
  }

  test("noveltyAgainstFrequencies: increment probes the persisted table, no corpus rescan") {
    val corpusDf = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t")).toDF("doc_id", "text")
    val freqs = Decontaminate.gramFrequencies(corpusDf, "doc_id", "text", n = 8)
    val inc = Seq(
      (10L, "a b c d e f g h i j"),       // all grams known → 0.0
      (11L, "z1 z2 z3 z4 z5 z6 z7 z8"),   // one unseen gram → 1.0
      (12L, "c d e f g h i j k l"),       // 1 of 3 grams ("c..j") known → 2/3 novel
      (13L, "x y"))                       // too short → 1.0, zero grams
      .toDF("doc_id", "text")
    val got = Decontaminate.noveltyAgainstFrequencies(inc, freqs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) == ((10L, 3L, 0L, 0.0)))
    assert(got(11L) == ((11L, 1L, 1L, 1.0)))
    assert(got(12L) == ((12L, 3L, 2L, 2.0 / 3.0)))
    assert(got(13L) == ((13L, 0L, 0L, 1.0)))
  }
}
