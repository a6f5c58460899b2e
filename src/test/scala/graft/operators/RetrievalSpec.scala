package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("query_id", "doc_id", "rank")

  test("rrfFuse: score algebra, absent-list zeros, id tie-break") {
    // query 0: doc 10 in both lists, doc 11 sparse-only@1, doc 12 dense-only@1
    val sparse = ranks(Seq((0L, 10L, 2), (0L, 11L, 1)))
    val dense = ranks(Seq((0L, 10L, 3), (0L, 12L, 1)))
    val got = Retrieval.rrfFuse(Seq(sparse, dense), "query_id", "doc_id", k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    // doc 10: 1/62 + 1/63 ≈ 0.032; docs 11/12: 1/61 each — tie, id-ordered
    assert(got.map(_._1).toSeq == Seq(10L, 11L, 12L))
    assert(got(0)._3 == 1.0 / 62 + 1.0 / 63)
    assert(got(1)._3 == 1.0 / 61 && got(2)._3 == 1.0 / 61)
    assert(got(1)._2 == 2 && got(2)._2 == 3, "equal scores must tie-break by id")
  }

  test("rrfFuse: k cut applies per query, queries stay independent") {
    val a = ranks((1 to 8).map(i => (0L, 100L + i, i)) ++ Seq((1L, 500L, 1)))
    val b = ranks(Seq((1L, 501L, 1)))
    val got = Retrieval.rrfFuse(Seq(a, b), "query_id", "doc_id", k = 3)
    assert(got.filter(col("query_id") === 0L).count() == 3)
    assert(got.filter(col("query_id") === 1L).count() == 2)
  }

  test("hybridTopK: a doc strong in one modality surfaces via fusion") {
    // text cluster: docs 0-4 share words with the query text; vector
    // cluster: docs 5-9 share the query's direction. The fused top must
    // interleave both clusters; rank 1 is the query itself (both lists).
    val corpus = (0L until 20L).map { i =>
      val text =
        if (i < 5) s"alpha beta gamma d$i"
        else s"zeta$i eta$i theta$i"
      val vec =
        if (i >= 5 && i < 10) Array(1.0f, 0.02f * i, 0f, 0f)
        else Array(0.01f * i.toFloat, 1.0f, 0.5f, 0.1f * i)
      (i, text, vec)
    }.toDF("doc_id", "text", "embedding")
    val queries = Seq((0L, "alpha beta gamma d0", Array(1.0f, 0f, 0f, 0f)))
      .toDF("query_id", "qtext", "embedding")
    val got = Retrieval.hybridTopK(corpus, queries,
      "doc_id", "text", "embedding", "query_id", "qtext", k = 8)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val topIds = got.filter(_._2 <= 8).keySet
    assert(topIds.exists(_ < 5) && topIds.exists(i => i >= 5 && i < 10),
      s"fusion must surface both modalities, got $topIds")
    // the exact text twin of the query (doc 0) must fuse near the top even
    // though its vector points away from the query direction
    assert(got.contains(0L) && got(0L) <= 3, s"doc 0 fused at ${got.get(0L)}")
  }

  test("plan: the fused per-query cut runs a partial WindowGroupLimit") {
    val corpus = (0L until 100L).map(i =>
      (i, s"w${i % 11} w${i % 7} shared", Array.tabulate(4)(j => (i % (j + 2)).toFloat)))
      .toDF("doc_id", "text", "embedding")
    val queries = Seq((0L, "w1 shared", Array(1.0f, 1.0f, 0f, 0f)))
      .toDF("query_id", "qtext", "embedding")
    val plan = Retrieval.hybridTopK(corpus, queries,
      "doc_id", "text", "embedding", "query_id", "qtext", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"expected partial WindowGroupLimit for the rrf cut:\n$plan")
  }

  test("pluggable dense leg: swapped ANN retrievers reproduce the exact hybrid " +
      "at recall-1 constructions") {
    // positive-orthant vectors → every sign-LSH bucket is identical
    // (single bucket ⇒ LSH scores the full corpus ⇒ recall 1); quantized
    // with a rescore pool covering the corpus is exact by construction
    val corpus = (0L until 24L).map { i =>
      val text = s"w${i % 6} w${(i * 7) % 6} filler$i"
      val vec = Array.tabulate(8)(j => 0.1f + (((i + 1) * (j + 3)) % 11).toFloat / 11f)
      (i, text, vec)
    }.toDF("id", "text", "vec")
    // disjoint query ids: the ANN tiers exclude id-equal self matches,
    // the exact tier is called without exclusion — disjointness makes all
    // three legs see the identical candidate space
    val queries = corpus.filter($"id" < 3L)
      .select(($"id" + 1000L).as("qid"), $"text".as("qtext"), $"vec")
    def run(dense: Retrieval.DenseRetriever) =
      Retrieval.hybridTopK(corpus, queries, "id", "text", "vec",
          "qid", "qtext", k = 5, dense = dense)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._3)).toSeq
    val exact = run(Retrieval.DenseExact)
    // rescoreFactor 5 ⇒ pool = 2k·5 = 50 > corpus ⇒ exact candidates
    assert(run(Retrieval.denseQuantized(rescoreFactor = 5)) == exact,
      "quantized leg at full-coverage rescore must reproduce the exact hybrid")

    // LSH recall-1 construction: collinear vectors — scaling preserves
    // every hyperplane sign, so ALL rows share one bucket (full candidate
    // space) and cosine ties resolve identically by id
    val collinear = (0L until 24L).map { i =>
      val text = s"w${i % 6} w${(i * 7) % 6} filler$i"
      (i, text, Array.tabulate(8)(j => (j + 1).toFloat * (i + 1)))
    }.toDF("id", "text", "vec")
    val cq = collinear.filter($"id" < 3L)
      .select(($"id" + 1000L).as("qid"), $"text".as("qtext"), $"vec")
    def runC(dense: Retrieval.DenseRetriever) =
      Retrieval.hybridTopK(collinear, cq, "id", "text", "vec",
          "qid", "qtext", k = 5, dense = dense)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._3)).toSeq
    assert(runC(Retrieval.denseLsh(planes = 4, probeHamming = 0)) ==
      runC(Retrieval.DenseExact),
      "LSH leg on a single-bucket construction must reproduce the exact hybrid")
  }
}
