package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Document chunking — slice long documents into fixed-size overlapping
 * windows (the "context-length fitting" step: a 200 KB document becomes
 * ~50 training sequences of `size` chars with `overlap` chars of shared
 * context at each seam).
 *
 * Formulation: chunk starts are `0, stride, 2·stride, …` with
 * `stride = size - overlap`; the last chunk starts at the largest start
 * `< length` (an empty document yields NO chunks). Implemented as
 * `sequence(...)` + `transform(substring)` + `posexplode` — pure codegen'd
 * array expressions, zero shuffles, no UDFs. Row count multiplies by
 * ~length/stride, but bytes only by size/stride (the overlap factor), and
 * the explode pipelines into downstream operators inside one stage.
 */
object Chunking {

  /**
   * Explode `textCol` into (idCol…, chunk_ix, chunk_text, chunk_len) rows.
   * `chunk_ix` is 0-based; `chunk_len < size` only for the final chunk.
   */
  def chunk(df: DataFrame, idCols: Seq[String], textCol: String,
            size: Int, overlap: Int): DataFrame = {
    require(size > 0, "chunk size must be positive")
    require(overlap >= 0 && overlap < size, s"need 0 <= overlap < size, got $overlap/$size")
    val stride = size - overlap
    val t = col(textCol)
    // substr() is 1-based. Starts run 1, 1+stride, … up to length-overlap:
    // stopping there guarantees the final chunk reaches the end of the text
    // (last start > length - size) without ever emitting a chunk fully
    // contained in its predecessor.
    val starts = when(length(t) > 0,
      sequence(lit(1), greatest(length(t) - overlap, lit(1)), lit(stride)))
      .otherwise(array())
    val chunks = transform(starts, s => t.substr(s, lit(size)))
    df.select(idCols.map(col) :+ posexplode(chunks).as(Seq("chunk_ix", "chunk_text")): _*)
      .withColumn("chunk_len", length(col("chunk_text")))
  }
}
