package graft.write

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.sources.TokenPruner
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class OptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def dirFor(tag: String) =
    Files.createTempDirectory(s"graft_opt_$tag").toString + "/t"

  test("small files pack to fewer; content identical; large files untouched") {
    val dir = dirFor("basic")
    val schema = CqlSchema("t", Seq("id"))
    // one LARGE generation (single file) + 6 tiny appended files
    TokenSortedWriter.write((1L to 5000L).map(i => (i, s"v$i")).toDF("id", "v"),
      schema, dir, SaveMode.Append, TokenSortedWriter.WriteConf(numPartitions = 1))
    (0 until 6).foreach { b =>
      TokenSortedWriter.write(Seq((10000L + b, s"x$b")).toDF("id", "v"),
        schema, dir, SaveMode.Append, TokenSortedWriter.WriteConf(numPartitions = 1))
    }
    val before = TokenPruner.listFiles(spark, dir)
    assert(before.length == 7)
    val big = before.maxBy(_.sizeBytes)
    val rows0 = TokenSortedWriter.read(spark, schema, dir)
      .collect().map(_.toSeq).toSet

    val packed = TokenSortedWriter.optimizeSmallFiles(
      spark, schema, dir, smallBytes = big.sizeBytes, targetBytes = big.sizeBytes * 4)
    assert(packed == 6L, s"expected the 6 tiny files packed, got $packed")
    TokenPruner.invalidateListing(dir)
    val after = TokenPruner.listFiles(spark, dir)
    assert(after.length == 2, s"expected (large, packed), got ${after.length}")
    assert(after.exists(_.path == big.path), "the large file must be untouched")
    assert(TokenSortedWriter.read(spark, schema, dir)
      .collect().map(_.toSeq).toSet == rows0, "content must be verbatim")
    // second run: nothing left to do
    assert(TokenSortedWriter.optimizeSmallFiles(
      spark, schema, dir, smallBytes = big.sizeBytes, targetBytes = big.sizeBytes * 4) == 0L)
  }

  test("dv-heavy files fold SOLO regardless of size (merge-on-read compaction trigger)") {
    val dir = dirFor("dvheavy")
    val schema = CqlSchema("t", Seq("id"))
    // one generation, one file, snapshot-logged
    TokenSortedWriter.write((1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v"),
      schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, snapshot = true))
    val v0 = Snapshots.latestVersion(spark, dir).get
    val file = Snapshots.files(spark, dir, v0).head
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // hide 30% of the rows — above the default 20% trigger
    val dv = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv, (0L until 600L).toArray)
    Snapshots.commitDeltas(spark, dir, Map(file -> dv), Nil, Some(v0))
    // smallBytes tiny: the file does NOT qualify as small — only the DV
    // fraction can bring it in, and it must fold as a singleton bin
    val n = TokenSortedWriter.optimizeSmallFiles(spark, schema, dir,
      smallBytes = 1L, targetBytes = 1L << 30)
    assert(n == 1L, s"dv-heavy file must rewrite solo, replaced $n")
    val head = Snapshots.latestVersion(spark, dir).get
    assert(Snapshots.deletionVectors(spark, dir, head).isEmpty, "binding must drop")
    val t = spark.read.format("graft").option("path", dir).option("pk", "id").load()
    assert(t.count() == 1400L)
    // and the scan is columnar again (read tax cleared)
    assert(t.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    // a BELOW-threshold DV does not trigger a solo rewrite
    val v2 = Snapshots.latestVersion(spark, dir).get
    val file2 = Snapshots.files(spark, dir, v2).head
    val dv2 = DeletionVectors.newDvPath(dir)
    DeletionVectors.write(fs, dv2, Array(0L, 1L)) // 2 of 1400 rows
    Snapshots.commitDeltas(spark, dir, Map(file2 -> dv2), Nil, Some(v2))
    assert(TokenSortedWriter.optimizeSmallFiles(spark, schema, dir,
      smallBytes = 1L, targetBytes = 1L << 30) == 0L,
      "a light DV must wait for siblings, not churn the file")
  }

  test("layout-only: LWW versions and writetime generations survive verbatim") {
    val dir = dirFor("lww")
    val schema = CqlSchema("t", Seq("id"))
    // two generations of the same keys with writetimes; LWW must resolve
    // identically before and after packing
    TokenSortedWriter.write((1L to 50L).map(i => (i, s"old$i")).toDF("id", "v"),
      schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 3, writetimeMicros = Some(1000L)))
    TokenSortedWriter.write((1L to 50L by 2).map(i => (i, s"new$i")).toDF("id", "v"),
      schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 3, writetimeMicros = Some(2000L)))
    val before = TokenSortedWriter.readNormalized(spark, schema, dir)
      .collect().map(_.toSeq).toSet
    val packed = TokenSortedWriter.optimizeSmallFiles(
      spark, schema, dir, smallBytes = 1L << 20, targetBytes = 4L << 20)
    assert(packed >= 2L)
    assert(TokenSortedWriter.readNormalized(spark, schema, dir)
      .collect().map(_.toSeq).toSet == before,
      "merge semantics must be bit-identical after OPTIMIZE")
  }

  test("snapshot-logged table: one guarded commit, pre-optimize pin intact") {
    val dir = dirFor("snap")
    val schema = CqlSchema("t", Seq("id"))
    val conf = TokenSortedWriter.WriteConf(numPartitions = 4, snapshot = true)
    TokenSortedWriter.write((1L to 400L).map(i => (i, i)).toDF("id", "v"),
      schema, dir, SaveMode.Append, conf)
    val v0 = Snapshots.latestVersion(spark, dir).get
    val filesV0 = Snapshots.files(spark, dir, v0).toSet
    val packed = TokenSortedWriter.optimizeSmallFiles(
      spark, schema, dir, smallBytes = 1L << 20, targetBytes = 8L << 20)
    assert(packed == 4L)
    val v1 = Snapshots.latestVersion(spark, dir).get
    assert(v1 == v0 + 1)
    assert(Snapshots.files(spark, dir, v1).toSet != filesV0)
    // the pinned pre-optimize read still plans its own files
    val pinned = spark.read.format("graft").option("path", dir)
      .option("pk", "id").option("snapshotVersion", v0.toString).load()
    assert(pinned.count() == 400L)
    // live read sees exactly the packed layout
    TokenPruner.invalidateListing(dir)
    val live = spark.read.format("graft").option("path", dir).option("pk", "id").load()
    assert(live.count() == 400L)
  }

  test("single-generation disjoint layout stays disjoint and clustered") {
    val dir = dirFor("clustered")
    val schema = CqlSchema("t", Seq("id"))
    TokenSortedWriter.write((1L to 2000L).map(i => (i, i)).toDF("id", "v"),
      schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 8, keepTokenColumn = true))
    assert(TokenSortedWriter.optimizeSmallFiles(
      spark, schema, dir, smallBytes = 1L << 20, targetBytes = 8L << 20) == 8L)
    TokenPruner.invalidateListing(dir)
    val after = TokenPruner.listFiles(spark, dir)
    val ranges = after.flatMap(_.tokenRange).sortBy(_._1)
    assert(ranges.length == after.length, "token stats must survive packing")
    ranges.zip(ranges.tail).foreach { case ((_, aMax), (bMin, _)) =>
      assert(aMax < bMin, "packed files must stay pairwise disjoint")
    }
    // the clustered no-shuffle property still holds on the packed layout
    val read = spark.read.format("graft").option("path", dir)
      .option("pk", "id").option("clustered", "true").load()
    val plan = read.groupBy(col("id")).agg(sum("v")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"clustered agg must stay shuffle-free:\n$plan")
  }

  test("change capture rides across OPTIMIZE; logical rewrites still refuse") {
    val dir = dirFor("feed")
    val schema = CqlSchema("t", Seq("id"))
    val conf = TokenSortedWriter.WriteConf(numPartitions = 2, snapshot = true)
    TokenSortedWriter.write((1L to 50L).map(i => (i, i)).toDF("id", "v"),
      schema, dir, SaveMode.Append, conf) // v1
    TokenSortedWriter.write((51L to 80L).map(i => (i, i)).toDF("id", "v"),
      schema, dir, SaveMode.Append, conf) // v2
    assert(TokenSortedWriter.optimizeSmallFiles(
      spark, schema, dir, smallBytes = 1L << 20, targetBytes = 8L << 20) == 4L) // v3
    TokenSortedWriter.write((81L to 90L).map(i => (i, i)).toDF("id", "v"),
      schema, dir, SaveMode.Append, conf) // v4
    assert(Snapshots.latestVersion(spark, dir).contains(4L))
    // full range: every row exactly once, the repack invisible
    val all = Snapshots.readChanges(spark, dir, 0L, 4L)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    assert(all.toSeq == (1L to 90L))
    // tail range after the repack: just the v4 increment
    assert(Snapshots.readChanges(spark, dir, 3L, 4L).count() == 10L)
    // range (1, 4]: v2 + v4, with v3 skipped
    assert(Snapshots.readChanges(spark, dir, 1L, 4L)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      ((51L to 80L) ++ (81L to 90L)))
    // the streaming twin rides across the repack too
    val sink = "opt_feed_sink"
    val q = spark.readStream.format("graft")
      .option("path", dir).option("pk", "id")
      .option("changeFeed", "true").option("startingVersion", "0").load()
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    assert(spark.table(sink).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq == (1L to 90L))
    // a LOGICAL rewrite (compaction collapses versions) still fails loudly
    TokenSortedWriter.compactInPlace(spark, schema, dir, vacuumRetain = 10) // v5+
    val e = intercept[IllegalStateException] {
      Snapshots.readChanges(spark, dir, 4L, Snapshots.latestVersion(spark, dir).get)
    }
    assert(e.getMessage.contains("rewrite"), e.getMessage)
  }

  test("dir-partitioned: replacements stay inside their partition dirs") {
    val dir = dirFor("dirs")
    val schema = CqlSchema("t", Seq("id"))
    (0 until 3).foreach { b =>
      TokenSortedWriter.write(
        (1L to 60L).map(i => (b * 100L + i, if (i % 2 == 0) "even" else "odd", i))
          .toDF("id", "cat", "v"),
        schema, dir, SaveMode.Append,
        TokenSortedWriter.WriteConf(numPartitions = 1, partitionBy = Seq("cat")))
    }
    val rows0 = TokenSortedWriter.read(spark, schema, dir).collect().map(_.toSeq).toSet
    val packed = TokenSortedWriter.optimizeSmallFiles(
      spark, schema, dir, smallBytes = 1L << 20, targetBytes = 8L << 20)
    assert(packed == 6L, s"3 small files per cat dir pack per-dir, got $packed")
    TokenPruner.invalidateListing(dir)
    val after = TokenPruner.listFiles(spark, dir)
    assert(after.length == 2)
    assert(after.forall(f => TokenPruner.dirValues(f.path).contains("cat")))
    assert(TokenSortedWriter.read(spark, schema, dir).collect().map(_.toSeq).toSet == rows0)
  }
}
