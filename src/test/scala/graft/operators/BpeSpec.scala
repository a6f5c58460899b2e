package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  import spark.implicits._

  private val M = graft.functions.BpeCodec.Marker

  private lazy val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower newest newest"),
    (3L, "newest newest newest widest")).toDF("doc_id", "text")

  test("train learns the classic merge ladder deterministically") {
    val model = Bpe.train(corpus, "text", numMerges = 4)
    // word counts: low=5, lower=2, newest=5, widest=1. Round-1 pair counts:
    // (l,o)=7, (o,w)=7, (w,e)=7 (newest 5 + lower 2); everything else < 7.
    // The 7-way tie breaks lexicographically: (l,o).
    assert(model.merges.head == (("l", "o")))
    assert(model.merges.length == 4)
    // retraining reproduces the identical table
    assert(Bpe.train(corpus, "text", numMerges = 4).merges == model.merges)
  }

  test("encode merges learned pairs; token count shrinks as merges grow") {
    def total(n: Int): Long = {
      val model = Bpe.train(corpus, "text", numMerges = n)
      Bpe.withTokens(corpus, "text", model)
        .agg(sum(col("n_bpe_tokens"))).as[Long].head()
    }
    val none = total(0)
    val some = total(8)
    val more = total(40)
    assert(none > some && some > more)
    // zero merges = chars + one marker per word
    val charsPlusMarkers = corpus.agg(
      sum(length(regexp_replace(col("text"), " ", "")) +
        size(split(col("text"), " ", -1)))).as[Long].head()
    assert(none == charsPlusMarkers)
  }

  test("decode is the exact inverse, including empty and multi-space texts") {
    val hostile = Seq(
      (1L, "low lower lowest"),
      (2L, ""),
      (3L, "  leading and  double  spaces "),
      (4L, "unicode café 中文 ok"),
      (5L, "tab\tand\nnewline stay")).toDF("doc_id", "text")
    val model = Bpe.train(corpus, "text", numMerges = 20)
    val out = hostile
      .withColumn("decoded", Bpe.decode(Bpe.encode(col("text"), model)))
      .select("text", "decoded").as[(String, String)].collect()
    out.foreach { case (t, d) => assert(d == t, s"roundtrip broke for '$t'") }
  }

  test("encode of an unseen word degrades to characters, never fails") {
    val model = Bpe.train(corpus, "text", numMerges = 10)
    val toks = Seq((1L, "zzz")).toDF("doc_id", "text")
      .select(Bpe.encode(col("text"), model).as("t"))
      .as[Seq[String]].head()
    assert(toks.mkString("") == "zzz" + M)
  }

  test("train rejects a corpus containing the marker; honors minPairCount") {
    val bad = Seq((1L, s"has${M}marker")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Bpe.train(bad, "text", 5))
    // every word unique, all pair counts = 1 < minPairCount=2 → no merges
    val uniq = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    assert(Bpe.train(uniq, "text", 10).merges.isEmpty)
  }

  test("encode plan stays in whole-stage codegen with zero exchanges") {
    // a parquet-backed frame, so ConvertToLocalRelation cannot fold the
    // projection away before the plan is inspected
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_plan_").toString + "/t"
    corpus.write.parquet(dir)
    val model = Bpe.train(corpus, "text", numMerges = 8)
    val onDisk = spark.read.parquet(dir)
    val plan = Bpe.withTokens(onDisk, "text", model)
      .select("doc_id", "n_bpe_tokens")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"BPE encode must not shuffle:\n$plan")
    // `*(n)` marks a WholeStageCodegen stage in the compact plan string —
    // the bpe_encode projection must sit inside one, not fall back
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("bpe_encode")),
      s"expected the bpe_encode projection inside a codegen stage:\n$plan")
  }
}
