package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.write.TokenSortedWriter
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Planning listing cache: a warm scan of an unchanged table does ONE
 *  listStatus round-trip (no recursive walk, no footer reads); any write
 *  through the engine invalidates via the root fingerprint (the manifest
 *  dir's mtime bumps on every write). */
class ListingCacheSpec extends SparkSpec {

  private val schema = CqlSchema("t", Seq("id"))

  test("warm listings hit the cache; writes invalidate; results stay fresh") {
    val dir = Files.createTempDirectory("graft_cache_").toString + "/t"
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i * 3)).toDF("id", "v")
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true))

    TokenPruner.invalidateListing(dir)
    val w0 = TokenPruner.fullWalks.get()
    val first = TokenPruner.listFiles(spark, dir)
    assert(TokenPruner.fullWalks.get() == w0 + 1, "cold listing walks once")
    // warm: repeated planning does not re-walk
    val second = TokenPruner.listFiles(spark, dir)
    assert(TokenPruner.fullWalks.get() == w0 + 1, "warm listing must not walk")
    assert(second.toSeq == first.toSeq)
    // a real scan plans from the same cache
    val n = spark.read.format("graft").option("path", dir).option("pk", "id")
      .load().filter(col("id") <= 10L).count()
    assert(n == 10L)
    assert(TokenPruner.fullWalks.get() == w0 + 1, "scan planning reuses the cache")

    // an append through the writer changes the manifest dir => fingerprint
    // changes => next listing re-walks and sees the new generation
    TokenSortedWriter.write(df.withColumn("v", col("v") + 1L), schema, dir,
      SaveMode.Append, TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true))
    val third = TokenPruner.listFiles(spark, dir)
    assert(TokenPruner.fullWalks.get() == w0 + 2, "append must invalidate")
    assert(third.length > first.length, "new files visible after invalidation")

    // explicit invalidation forces a re-walk even with no changes
    TokenPruner.invalidateListing(dir)
    TokenPruner.listFiles(spark, dir)
    assert(TokenPruner.fullWalks.get() == w0 + 3)
  }

  test("graft.listing.cache=false bypasses the cache: every listing walks") {
    val dir = Files.createTempDirectory("graft_cache3_").toString + "/t"
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = true))
    spark.conf.set("graft.listing.cache", "false")
    try {
      val w0 = TokenPruner.fullWalks.get()
      TokenPruner.listFiles(spark, dir)
      TokenPruner.listFiles(spark, dir)
      assert(TokenPruner.fullWalks.get() == w0 + 2,
        "cache off: repeated listings must each walk (out-of-band edits visible)")
    } finally spark.conf.unset("graft.listing.cache")
    // conf restored: warm behavior returns
    val w1 = TokenPruner.fullWalks.get()
    TokenPruner.listFiles(spark, dir)
    TokenPruner.listFiles(spark, dir)
    assert(TokenPruner.fullWalks.get() <= w1 + 1, "cache on again: warm listing cached")
  }

  test("out-of-band deep edit: cache goes stale (documented), cache=false sees it") {
    // The root fingerprint covers root children + the manifest/deletes dirs.
    // An edit TWO levels down (inside graft_p_a=*/graft_p_b=*/) changes no
    // root-level mtime and no manifest file — the documented blind spot.
    // graft.listing.cache=false is the contract for such deployments.
    val dir = Files.createTempDirectory("graft_cache4_").toString + "/t"
    import spark.implicits._
    val df = Seq((1L, "x", "p", 1L), (2L, "x", "q", 2L), (3L, "y", "p", 3L))
      .toDF("id", "a", "b", "v")
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = true,
        partitionBy = Seq("a", "b")))
    TokenPruner.invalidateListing(dir)
    val cold = TokenPruner.listFiles(spark, dir)

    // out-of-band surgery: clone a leaf data file under a new name; only
    // the LEAF dir's mtime changes, which the root listing cannot see
    val leaf = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.toString.endsWith(".parquet") && p.toString.contains("graft_p_b="))
      .findFirst().get()
    java.nio.file.Files.copy(leaf, leaf.getParent.resolve("zz-oob-copy.parquet"))

    // warm cache: the stale listing is returned — the documented behavior
    val stale = TokenPruner.listFiles(spark, dir)
    assert(stale.length == cold.length,
      "blind spot: a deep out-of-band file must be invisible to the warm cache")

    // cache off: every listing walks, the new file is planned
    spark.conf.set("graft.listing.cache", "false")
    try {
      val fresh = TokenPruner.listFiles(spark, dir)
      assert(fresh.length == cold.length + 1,
        "cache=false must see the out-of-band file")
      assert(fresh.map(_.path).exists(_.endsWith("zz-oob-copy.parquet")))
      // end-to-end: the scan row count includes the cloned file's rows
      val n = spark.read.format("graft").option("path", dir).option("pk", "id")
        .load().count()
      assert(n == df.count() + spark.read.parquet(leaf.toString).count(),
        "scan with cache=false must read the out-of-band rows")
    } finally spark.conf.unset("graft.listing.cache")

    // explicit invalidation is the cache-on remedy after out-of-band surgery
    TokenPruner.invalidateListing(dir)
    assert(TokenPruner.listFiles(spark, dir).length == cold.length + 1)
  }

  test("dir-partitioned layout: appends into existing partition dirs are seen") {
    val dir = Files.createTempDirectory("graft_cache2_").toString + "/t"
    import spark.implicits._
    val conf = TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = true,
      partitionBy = Seq("cat"))
    val a = Seq((1L, "x", 1L), (2L, "y", 2L)).toDF("id", "cat", "v")
    TokenSortedWriter.write(a, schema, dir, SaveMode.Append, conf)
    val cold = TokenPruner.listFiles(spark, dir)
    // append lands INSIDE the existing graft_p_cat=x dir — no new root file,
    // but the manifest write still bumps the root fingerprint
    TokenSortedWriter.write(Seq((3L, "x", 3L)).toDF("id", "cat", "v"),
      schema, dir, SaveMode.Append, conf)
    val warm = TokenPruner.listFiles(spark, dir)
    assert(warm.length == cold.length + 1, "deep append must be visible")
  }

  test("foreign-meta session cache: later plans touch NO source IO (read-" +
      "only clone clients stop re-reading foreign footers); stale manifest " +
      "rows validate loudly") {
    val src = Files.createTempDirectory("graft_fmc_").toString + "/src"
    import spark.implicits._
    TokenSortedWriter.write((1L to 500L).map(i => (i, i)).toDF("id", "v"),
      schema, src, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true))
    val paths = TokenPruner.listFiles(spark, src).map(_.path).toSeq
    assert(paths.length >= 2)
    val clone = Files.createTempDirectory("graft_fmc_clone_").toString
    val m1 = TokenPruner.foreignMetas(spark, clone, paths)
    assert(m1.map(_.path).toSet == paths.toSet)
    // delete the SOURCE files and the clone's freshly persisted manifest
    // out-of-band: a second plan must be served ENTIRELY from the session
    // cache — any footer read or existence probe would now throw
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    paths.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), false))
    fs.delete(new org.apache.hadoop.fs.Path(clone), true)
    val m2 = TokenPruner.foreignMetas(spark, clone, paths)
    assert(m2.map(_.path).toSet == paths.toSet,
      "warm foreign planning must not re-touch the source")

    // manifest-known-but-vacuumed paths refuse LOUDLY at planning: persist
    // a manifest row for a path, clear the session cache, delete the file
    val src2 = Files.createTempDirectory("graft_fmc2_").toString + "/src"
    TokenSortedWriter.write(Seq((1L, 1L)).toDF("id", "v"),
      schema, src2, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = true))
    val p2 = TokenPruner.listFiles(spark, src2).map(_.path).toSeq
    val clone2 = Files.createTempDirectory("graft_fmc2_clone_").toString
    TokenPruner.foreignMetas(spark, clone2, p2) // persists manifest rows
    TokenPruner.invalidateForeignCache()
    p2.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), false))
    val e = intercept[IllegalStateException] {
      TokenPruner.foreignMetas(spark, clone2, p2)
    }
    assert(e.getMessage.contains("vacuumed"),
      s"stale manifest rows must surface the clone-specific refusal: $e")
  }
}
