package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "a cat and a cat")).toDF("doc_id", "text")

  test("termCounts: exact corpus counts, empties dropped") {
    val m = Vocab.termCounts(corpus, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("the") == 3 && m("cat") == 3 && m("sat") == 2 && m("a") == 2 && m("mat") == 1)
    val padded = Seq((1L, "  x   y ")).toDF("doc_id", "text")
    assert(Vocab.termCounts(padded, "doc_id", "text").count() == 2)
  }

  test("topTerms: k rows, count-desc with word tiebreak") {
    val top = Vocab.topTerms(corpus, "doc_id", "text", 3).collect()
    assert(top.length == 3)
    assert(top(0).getString(0) == "cat" && top(1).getString(0) == "the") // tie 3/3 → word asc
    assert(top(2).getString(0) == "a" || top(2).getString(0) == "sat")   // tie 2/2 → 'a'
    assert(top(2).getString(0) == "a")
  }

  test("tfIdf: hand-checked scores") {
    val rows = Vocab.tfIdf(corpus, "doc_id", "text")
      .filter(col("doc_id") === 3L && col("word") === "cat").head()
    // doc 3 = "a cat and a cat": 5 tokens, cat appears 2x, df(cat)=2, N=3
    assert(rows.getAs[Long]("tf_count") == 2L)
    assert(rows.getAs[Long]("df") == 2L)
    assert(rows.getAs[Double]("tf") == 2.0 / 5.0)
    assert(rows.getAs[Double]("idf") == StrictMath.log(3.0 / 2.0))
    assert(rows.getAs[Double]("score") == (2.0 / 5.0) * StrictMath.log(3.0 / 2.0))
  }

  test("bm25TopK: hand-checked score, rank order, k cap, tie-break") {
    val qs = Seq((10L, "cat"), (11L, "sat dog"), (12L, "zzz")).toDF("qid", "qtext")
    val out = Vocab.bm25TopK(corpus, "doc_id", "text", qs, "qid", "qtext", k = 2)
      .collect().groupBy(_.getAs[Long]("qid"))

    // query "cat": docs 1 (tf=1, dl=6) and 3 (tf=2, dl=5); df=2, N=3, avgdl=14/3
    val cat = out(10L).sortBy(_.getAs[Int]("rank"))
    assert(cat.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L, 1L))
    def bm25(tf: Double, df: Double, dl: Double): BigDecimal = {
      val idf = StrictMath.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
      val s = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (14.0 / 3.0)))
      BigDecimal(s).setScale(7, BigDecimal.RoundingMode.HALF_UP)
    }
    assert(cat.head.getAs[Double]("score") == bm25(2, 2, 5).toDouble)
    assert(cat.head.getAs[Long]("n_matched") == 1L && cat.head.getAs[Long]("tf_sum") == 2L)

    // query "sat dog": doc 2 matches both terms (score sums), doc 1 only "sat"
    val sd = out(11L).sortBy(_.getAs[Int]("rank"))
    assert(sd.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L))
    assert(sd.head.getAs[Long]("n_matched") == 2L)
    assert(sd.head.getAs[Double]("score") ==
      (bm25(1, 2, 3) + bm25(1, 1, 3)).toDouble)

    // no corpus doc contains "zzz" → query absent entirely
    assert(!out.contains(12L))

    // k cap: with k=1 only rank 1 survives per query
    val capped = Vocab.bm25TopK(corpus, "doc_id", "text", qs, "qid", "qtext", k = 1)
    assert(capped.count() == 2L)
    assert(capped.filter(col("rank") > 1).count() == 0L)
  }

  test("tfIdf: a corpus-wide word scores zero, a unique word scores highest in its doc") {
    val scored = Vocab.tfIdf(corpus, "doc_id", "text")
    val everywhere = scored.filter(col("word") === "sat" && col("doc_id") === 2L).head()
    assert(everywhere.getAs[Double]("idf") > 0) // df=2 of 3 docs
    val dfThe = scored.filter(col("word") === "the").head().getAs[Long]("df")
    assert(dfThe == 2L)
    // "mat" is unique to doc 1 → max idf
    val best = scored.filter(col("doc_id") === 1L)
      .orderBy(col("score").desc, col("word").asc).head()
    assert(best.getAs[String]("word") == "mat")
  }
}
