package graft.write

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.sources.TokenPruner
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Manifest fragment folding: cold plan time must stay O(threshold) driver
 *  round-trips no matter how many write batches ever landed on the table. */
class ManifestCompactSpec extends SparkSpec {
  import spark.implicits._

  private val schema = CqlSchema("t", Seq("id"))

  private def canon(ms: Array[TokenPruner.FileMeta]) =
    ms.map(m => (m.path, m.rows, m.tokenRange, m.pkRanges, m.strRanges, m.digest))
      .sortBy(_._1).toSeq

  test("compact folds fragments into one file with identical planning stats") {
    val dir = Files.createTempDirectory("graft_mfc_").toString + "/t"
    for (b <- 0 until 3)
      TokenSortedWriter.write(
        (0 until 50).map(i => (b * 100L + i, s"v$i")).toDF("id", "payload"),
        schema, dir, SaveMode.Append,
        TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true))
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val mdir = new org.apache.hadoop.fs.Path(fs.makeQualified(p), Manifest.Dir)
    def frags() = fs.listStatus(mdir).filter(_.getPath.getName.endsWith(".tsv"))
    assert(frags().length == 3)

    TokenPruner.invalidateListing(dir)
    val before = canon(TokenPruner.listFiles(spark, dir))
    assert(Manifest.compact(spark, dir) == 3)
    assert(frags().length == 1)
    TokenPruner.invalidateListing(dir)
    assert(canon(TokenPruner.listFiles(spark, dir)) === before)
    // idempotent: nothing left to fold
    assert(Manifest.compact(spark, dir) == 0)
  }

  test("appendFor auto-folds once fragments exceed the threshold") {
    val dir = Files.createTempDirectory("graft_mfa_").toString + "/t"
    TokenSortedWriter.write(
      (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
      schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true))
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val mdir = new org.apache.hadoop.fs.Path(root, Manifest.Dir)
    val real = fs.listStatus(mdir).filter(_.getPath.getName.endsWith(".tsv")).head
    // simulate a long-lived table: clone the fragment past the threshold
    // (duplicate entries are per-path identical — read() merges by path)
    for (i <- 0 until (Manifest.CompactThreshold + 2))
      org.apache.hadoop.fs.FileUtil.copy(fs, real.getPath, fs,
        new org.apache.hadoop.fs.Path(mdir, f"manifest-clone$i%04d.tsv"),
        false, spark.sessionState.newHadoopConf())
    TokenPruner.invalidateListing(dir)
    val before = canon(TokenPruner.listFiles(spark, dir))
    // the next real append folds everything
    TokenSortedWriter.write(
      (100 until 150).map(i => (i.toLong, s"v$i")).toDF("id", "payload"),
      schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true))
    val after = fs.listStatus(mdir).filter(_.getPath.getName.endsWith(".tsv"))
    assert(after.length == 1,
      s"expected one folded manifest, got ${after.length}")
    TokenPruner.invalidateListing(dir)
    val merged = canon(TokenPruner.listFiles(spark, dir))
    assert(merged.size == before.size + 2) // 2 new data files, old stats intact
    assert(before.forall(merged.contains))
  }
}
