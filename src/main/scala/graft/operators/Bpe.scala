package graft.operators

import graft.functions.{BpeCodec, BpeEncodeExpression}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BPE tokenizer: distributed vocabulary training + codegen encode +
 * exact decode — the "how many tokens is this corpus, under a vocab
 * learned FROM this corpus" layer of a training-data pipeline (mixture
 * budgeting, packing and pricing all count in learned-tokenizer tokens,
 * not words).
 *
 * Scale shape (the standard two-level factorization every tokenizer
 * trainer uses):
 *  - the CORPUS-side work is one word-count aggregation — explode →
 *    map-side-combined count, the same one-shuffle shape as
 *    [[Vocab.termCounts]]; at 100 TB the token stream is ~1e13 but the
 *    DISTINCT-word table is ~1e6-1e8 (Heaps' law), and `maxWords` caps the
 *    driver copy by taking the most frequent words (rare-word tails
 *    contribute ~0 weight to pair statistics);
 *  - the MERGE-LEARNING loop then runs on that weighted word table on the
 *    driver — O(numMerges × Σ word lengths), no cluster round-trips —
 *    exactly how fastBPE/HuggingFace train;
 *  - ENCODING is a native codegen expression over a broadcast-by-reference
 *    merge table ([[BpeEncodeExpression]]): embarrassingly parallel, zero
 *    shuffle, stays inside WholeStageCodegen.
 *
 * Determinism: merge selection breaks count ties by lexicographic pair
 * order, so the learned vocabulary is a pure function of the word counts
 * (cluster size, partitioning, row order — all irrelevant).
 */
object Bpe {

  /** A trained merge table, rank-ordered. */
  final case class Model(merges: Seq[(String, String)]) {
    lazy val codec: BpeCodec = new BpeCodec(merges.toArray)
    def vocabSize: Int = merges.length
  }

  /**
   * Learn `numMerges` BPE merges from the corpus's weighted word counts.
   *
   * @param maxWords  driver-side bound: only the `maxWords` most frequent
   *                  distinct words (deterministic count-desc, word-asc
   *                  order) feed pair statistics
   * @param minPairCount stop early when the best pair occurs fewer times
   */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 1000000,
      minPairCount: Long = 2L): Model = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val marked = df.filter(col(textCol).contains(graft.functions.BpeCodec.Marker)).limit(1)
    require(marked.isEmpty,
      "corpus contains the BPE end-of-word marker U+0001; scrub control chars first")
    val wordCounts = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    Model(learnMerges(wordCounts, numMerges, minPairCount))
  }

  /** Driver-side merge learning over the weighted word table. */
  private[operators] def learnMerges(
      wordCounts: Array[(String, Long)],
      numMerges: Int,
      minPairCount: Long): Seq[(String, String)] = {
    val seed = new BpeCodec(Array.empty)
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (seed.symbols(w), c) }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), c, (a, b) => a + b)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        import scala.jdk.CollectionConverters._
        // deterministic argmax: highest weighted count, then smallest pair
        val best = counts.entrySet().asScala.minBy { e =>
          (-e.getValue, e.getKey._1, e.getKey._2)
        }
        if (best.getValue < minPairCount) exhausted = true
        else {
          val (a, b) = best.getKey
          merges += ((a, b))
          val ab = a + b
          words = words.map { case (syms, c) =>
            if (syms.length < 2) (syms, c)
            else {
              val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                  out += ab; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.toArray, c)
            }
          }
          m += 1
        }
      }
    }
    merges.result()
  }

  /** Token array of a text column under a trained model (codegen). */
  def encode(text: Column, model: Model): Column =
    BpeEncodeExpression(text, model.codec)

  /** Exact inverse of [[encode]]: concatenate tokens, turn each end-of-word
   *  marker back into a space, drop the one trailing marker-space. Pure
   *  codegen (`concat_ws` + `translate` + `substring`). */
  def decode(tokens: Column): Column = {
    val joined = translate(concat_ws("", tokens), graft.functions.BpeCodec.Marker, " ")
    joined.substr(lit(1), length(joined) - 1)
  }

  /** Adds `bpe_tokens` (array) and `n_bpe_tokens` to the frame. */
  def withTokens(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val toks = encode(col(textCol), model)
    df.withColumn("bpe_tokens", toks)
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
  }
}
