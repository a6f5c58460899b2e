package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private def chunksOf(s: String, size: Int, overlap: Int): Seq[(Int, String)] =
    Chunking.chunk(Seq((1L, s)).toDF("doc_id", "text"), Seq("doc_id"), "text", size, overlap)
      .orderBy("chunk_ix")
      .collect().map(r => (r.getAs[Int]("chunk_ix"), r.getAs[String]("chunk_text"))).toSeq

  test("exact cover with overlap") {
    val cs = chunksOf("abcdefghij", size = 6, overlap = 2) // stride 4, len 10
    assert(cs == Seq((0, "abcdef"), (1, "efghij")))
  }

  test("full coverage, end reached, no chunk contained in its predecessor") {
    for (len <- 1 to 40; (size, overlap) <- Seq((6, 2), (8, 0), (5, 4))) {
      val text = (1 to len).map(i => ('a' + (i % 26)).toChar).mkString
      val cs = chunksOf(text, size, overlap)
      val stride = size - overlap
      assert(cs.nonEmpty, s"len=$len $size/$overlap")
      // each chunk is the right substring of the source at start = ix*stride
      cs.foreach { case (ix, c) =>
        assert(c == text.substring(ix * stride, math.min(ix * stride + size, len)),
          s"len=$len $size/$overlap ix=$ix")
      }
      // indices are consecutive from 0; coverage: next start <= previous end
      assert(cs.map(_._1) == cs.indices.toSeq)
      // the last chunk reaches the end, and no chunk ends where its
      // predecessor already ended (containment)
      assert(cs.last._1 * stride + cs.last._2.length == len, s"len=$len $size/$overlap")
      cs.sliding(2).foreach {
        case Seq((i1, c1), (i2, c2)) =>
          assert(i2 * stride + c2.length > i1 * stride + c1.length,
            s"len=$len $size/$overlap: chunk $i2 adds no new text")
        case _ =>
      }
    }
  }

  test("short and empty documents") {
    assert(chunksOf("ab", 64, 16) == Seq((0, "ab")))
    assert(chunksOf("", 64, 16).isEmpty)
  }

  test("zero overlap is exact partitioning") {
    val cs = chunksOf("abcdefghij", size = 4, overlap = 0)
    assert(cs.map(_._2) == Seq("abcd", "efgh", "ij"))
    assert(cs.map(_._2).mkString == "abcdefghij")
  }

  test("argument validation") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunk(df, Seq("doc_id"), "text", 0, 0))
    intercept[IllegalArgumentException](Chunking.chunk(df, Seq("doc_id"), "text", 4, 4))
  }
}
