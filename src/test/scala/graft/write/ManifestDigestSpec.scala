package graft.write

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.sources.TokenPruner
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Write-time xxhash64 content digests (reference parity:
 *  `SortedSSTableWriter.java:67-327` digests every written SSTable;
 *  `WriterDigestIntegrationTest`): recorded in the manifest, surfaced by the
 *  metadata source, verified loudly before compaction. */
class ManifestDigestSpec extends SparkSpec {

  private val schema = CqlSchema("t", Seq("id"))

  private def freshTable(): String = {
    val d = Files.createTempDirectory("graft_digest_").toString + "/t"
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i, i * 2, s"v$i")).toDF("id", "v", "s")
    TokenSortedWriter.write(df, schema, d, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 3, keepTokenColumn = true,
        writetimeMicros = Some(1000L)))
    d
  }

  test("every written file carries a digest; verification is clean; metadata exposes it") {
    val dir = freshTable()
    val files = TokenPruner.listFiles(spark, dir)
    assert(files.nonEmpty && files.forall(_.digest.isDefined),
      "write must record an xxhash64 digest per file")
    assert(Manifest.verifyDigests(spark, dir).isEmpty)
    val meta = spark.read.format("graft-metadata").option("path", dir).load()
    assert(meta.filter(col("digest").isNotNull).count() == meta.count())
  }

  test("a flipped byte is detected and compaction aborts loudly") {
    val dir = freshTable()
    val victim = TokenPruner.listFiles(spark, dir).head.path
    val local = new java.io.File(new java.net.URI(
      if (victim.startsWith("file:")) victim else "file://" + victim))
    val raf = new java.io.RandomAccessFile(local, "rw")
    try {
      val pos = local.length() / 2
      raf.seek(pos)
      val b = raf.readByte()
      raf.seek(pos)
      raf.writeByte((b ^ 0x5a).toByte.toInt)
    } finally raf.close()
    assert(Manifest.verifyDigests(spark, dir) == Seq(victim))
    val dst = Files.createTempDirectory("graft_digest_dst_").toString + "/t"
    val e = intercept[java.io.IOException](
      TokenSortedWriter.compact(spark, schema, dir, dst))
    assert(e.getMessage.contains("digest"))
  }

  test("column names with delimiter chars survive the manifest round-trip") {
    val weird = "a;b=c:d\te%f"
    assert(Manifest.unescapeCol(Manifest.escapeCol(weird)) == weird)
    // end-to-end: a real column named with delimiters keeps its own stats
    val dir = Files.createTempDirectory("graft_digest_esc_").toString + "/t"
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "a;b=c")
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1))
    val metas = TokenPruner.listFiles(spark, dir)
    assert(metas.forall(_.pkRanges.get("a;b=c").contains((10L, 20L))),
      s"got ${metas.map(_.pkRanges).toSeq}")
    // and no phantom column appeared under a delimiter fragment
    assert(metas.forall(m => !m.pkRanges.contains("c")))
  }
}
