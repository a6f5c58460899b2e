package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.write.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** DSv2 CDC table mode (`changeFeedMode=rows`): batch + micro-batch
 *  delivery of row-level events — inserts from added files, delete
 *  preimages from DV deltas — equal to the library batch twin
 *  [[Snapshots.readChangesWithDeletes]], with pruning-correct tag
 *  columns and the same loud refusals. */
class GraftCdfSourceSpec extends SparkSpec {

  private lazy val catName: String = {
    val base = Files.createTempDirectory("graft_cdfsrc_").toString
    spark.conf.set("spark.sql.catalog.cdfs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdfs.base", base)
    "cdfs"
  }
  private def baseDir: String = spark.conf.get(s"spark.sql.catalog.$catName.base")

  private def createMor(name: String, rows: Int = 120): String = {
    spark.sql(s"""CREATE TABLE $catName.db.$name (id BIGINT, cat STRING, v BIGINT)
                 |USING graft OPTIONS (pk 'id', partitions '3', snapshot 'true',
                 |dmlMode 'merge-on-read')""".stripMargin)
    spark.sql(s"INSERT INTO $catName.db.$name " +
      s"SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10 " +
      s"FROM range(1, ${rows + 1}) AS r(id)")
    s"$baseDir/db/$name"
  }

  private def cdf(dir: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graft")
        .option("path", dir).option("changeFeedMode", "rows"))(
      (r, kv) => r.option(kv._1, kv._2)).load()

  private def canon(df: DataFrame): Seq[(Long, Long, String, Long)] =
    df.select(col("id"), col("v"), col("_change_type"), col("_commit_version"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._4, t._3, t._1)).toSeq

  test("batch CDC read equals the library twin across insert + UPDATE + DELETE") {
    val dir = createMor("batch")
    spark.sql(s"UPDATE $catName.db.batch SET v = v + 900000 WHERE id % 10 = 3")
    spark.sql(s"DELETE FROM $catName.db.batch WHERE id % 10 = 6")
    val head = Snapshots.latestVersion(spark, dir).get

    val viaSource = canon(cdf(dir))
    val viaLibrary = canon(Snapshots.readChangesWithDeletes(spark, dir, 0L, head))
    assert(viaSource == viaLibrary)
    assert(viaSource.nonEmpty)
    // spot semantics: update pair present, preimage/postimage values exact
    val id3 = viaSource.filter(_._1 == 3L)
    assert(id3.map(r => (r._2, r._3)).toSet ==
      Set((30L, "insert"), (30L, "delete"), (900030L, "insert")))
  }

  test("startingVersion / endingVersion bound the batch range") {
    val dir = createMor("range")
    spark.sql(s"UPDATE $catName.db.range SET v = 0 WHERE id = 5") // v2
    spark.sql(s"DELETE FROM $catName.db.range WHERE v = 60")       // v3
    val only2 = canon(cdf(dir, "startingVersion" -> "1", "endingVersion" -> "2"))
    assert(only2.forall(_._4 == 2L) && only2.map(_._3).sorted == Seq("delete", "insert"))
    val from2 = canon(cdf(dir, "startingVersion" -> "2"))
    assert(from2.forall(_._4 == 3L) && from2 == Seq((6L, 60L, "delete", 3L)))
    val e = intercept[Exception] { cdf(dir, "endingVersion" -> "99").count() }
    assert(e.getMessage.contains("beyond the log head"))
  }

  test("startingTimestamp resolves the consumer's baseline by wall-clock: " +
      "commits after it deliver, commits at-or-before are the assumed state") {
    val dir = createMor("byts", rows = 20)
    val t1 = Snapshots.history(spark, dir).find(_._1 == 1L).get._2
    Thread.sleep(15) // separate v2's wall-clock from v1's
    spark.sql(s"UPDATE $catName.db.byts SET v = 0 WHERE id = 5") // v2
    // INCLUSIVE boundary (Delta semantics): a timestamp EXACTLY at v2's
    // commit delivers v2; one just after v1's commit delivers v2 only
    val t2 = Snapshots.history(spark, dir).find(_._1 == 2L).get._2
    val atV2 = canon(cdf(dir, "startingTimestamp" ->
      new java.sql.Timestamp(t2).toString))
    assert(atV2.nonEmpty && atV2.forall(_._4 == 2L),
      s"exact-boundary commit must deliver: $atV2")
    val after1 = canon(cdf(dir, "startingTimestamp" ->
      new java.sql.Timestamp(t1 + 1).toString))
    assert(after1.nonEmpty && after1.forall(_._4 == 2L), s"got $after1")
    // a timestamp before the first retained commit → everything
    val all = canon(cdf(dir, "startingTimestamp" -> "2000-01-01 00:00:00"))
    assert(all.exists(_._4 == 1L) && all.exists(_._4 == 2L))
    // both starting options together refuse
    val e = intercept[Exception] {
      cdf(dir, "startingVersion" -> "1",
        "startingTimestamp" -> "2000-01-01 00:00:00").count()
    }
    assert(e.getMessage.contains("not both"))
    // endingTimestamp bounds the range at the time-traveler's snapshot
    val upTo1 = canon(cdf(dir, "startingTimestamp" -> "2000-01-01 00:00:00",
      "endingTimestamp" -> new java.sql.Timestamp(t1).toString))
    assert(upTo1.nonEmpty && upTo1.forall(_._4 == 1L), s"got $upTo1")
  }

  test("column pruning: data-only, tags-only, and full projections all read") {
    val dir = createMor("prune")
    spark.sql(s"DELETE FROM $catName.db.prune WHERE v = 70")
    // data-only projection: tag columns pruned away entirely
    val ids = cdf(dir).select(col("id")).collect().map(_.getLong(0))
    assert(ids.length == 121 && ids.count(_ == 7L) == 2) // insert + delete preimage
    // tags-only projection
    val tags = cdf(dir).select(col("_change_type")).collect().map(_.getString(0))
    assert(tags.count(_ == "delete") == 1 && tags.count(_ == "insert") == 120)
    // pruning reaches the CDC scan: its read schema is exactly the
    // projection (the inner parquet read derives from the data half)
    val pruned = cdf(dir).select(col("id"), col("_change_type"))
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    assert(scan.readSchema().fieldNames.toSeq == Seq("id", "_change_type"),
      s"CDC scan must prune to the projection, read ${scan.readSchema().fieldNames.mkString(",")}")
    assert(pruned.count() == 121)
  }

  test("CDC stream: version-ledger offsets deliver the UPDATE as its " +
      "delete+insert pair; logical rewrite fails loudly with restart point") {
    val dir = createMor("stream")
    val stream = spark.readStream.format("graft")
      .option("path", dir).option("changeFeedMode", "rows").load()
    assert(stream.isStreaming)
    assert(stream.columns.takeRight(2).toSeq == Seq("_change_type", "_commit_version"))
    val q = stream.writeStream.format("memory").queryName("cdc_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdc_out").count() == 120L)
      spark.sql(s"UPDATE $catName.db.stream SET v = v + 1 WHERE id = 9")
      spark.sql(s"DELETE FROM $catName.db.stream WHERE v = 100")
      q.processAllAvailable()
      val events = spark.table("cdc_out")
        .select(col("id"), col("v"), col("_change_type"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(events.filter(_._1 == 9L).map(e => (e._2, e._3)).toSet ==
        Set((90L, "insert"), (90L, "delete"), (91L, "insert")))
      assert(events.filter(_._1 == 10L).map(e => (e._2, e._3)).toSet ==
        Set((100L, "insert"), (100L, "delete")))
      // logical rewrite mid-stream: loud, with the restart offset named
      val head = Snapshots.latestVersion(spark, dir).get
      Snapshots.commitRewrite(spark, dir, Snapshots.files(spark, dir, head).take(1))
      val e = intercept[Exception](q.processAllAvailable())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(m =>
        m.contains("logical rewrite") && m.contains("startingVersion=")),
        messages(e).mkString(" | "))
    } finally q.stop()
  }

  test("CDC stream with startingVersion skips history") {
    val dir = createMor("skip")
    val v1 = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"DELETE FROM $catName.db.skip WHERE v = 110")
    val stream = spark.readStream.format("graft")
      .option("path", dir).option("changeFeedMode", "rows")
      .option("startingVersion", v1.toString).load()
    val q = stream.writeStream.format("memory").queryName("cdc_skip")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cdc_skip")
        .select(col("id"), col("_change_type")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq((11L, "delete")))
    } finally q.stop()
  }

  test("plan: the DSv2 CDC batch read is scans + union only — zero exchanges " +
      "(insert partitions + positioned delete partitions, nothing shuffles)") {
    val dir = createMor("plan0")
    spark.sql(s"UPDATE $catName.db.plan0 SET v = v + 1 WHERE id % 4 = 1")
    spark.sql(s"DELETE FROM $catName.db.plan0 WHERE v % 40 = 0")
    val df = cdf(dir)
    val plan = df.queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      s"CDC read must not shuffle, found: ${exchanges.map(_.nodeName).mkString(",")}")
    assert(df.count() > 0)
  }

  test("end-to-end: CDC stream + foreachBatch MERGE keeps a mirror table " +
      "equal to the source head across insert/update/delete") {
    val dir = createMor("mirror", rows = 60)
    spark.sql(s"CREATE TABLE $catName.db.mirror_dst (id BIGINT, cat STRING, v BIGINT) " +
      "USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    val q = spark.readStream.format("graft")
      .option("path", dir).option("changeFeedMode", "rows").load()
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // last event per key wins: version ascending, and within one
        // version the insert postimage beats its paired delete preimage
        // ('insert' > 'delete' lexicographically — the pair IS an update)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"))
          .orderBy(col("_commit_version").desc, col("_change_type").desc)
        val latest = batch
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .drop("__rn")
        latest.createOrReplaceTempView("cdc_increment")
        latest.sparkSession.sql(
          s"""MERGE INTO $catName.db.mirror_dst t
             |USING cdc_increment s ON t.id = s.id
             |WHEN MATCHED AND s._change_type = 'delete' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET cat = s.cat, v = s.v
             |WHEN NOT MATCHED AND s._change_type = 'insert'
             |  THEN INSERT (id, cat, v) VALUES (s.id, s.cat, s.v)""".stripMargin)
        ()
      }.start()
    def mirrorEqualsSource(): Unit = {
      val src = spark.table(s"$catName.db.mirror").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
      val dst = spark.table(s"$catName.db.mirror_dst").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
      assert(dst == src)
    }
    try {
      q.processAllAvailable()
      mirrorEqualsSource()
      spark.sql(s"UPDATE $catName.db.mirror SET v = v + 7 WHERE id % 5 = 2")
      spark.sql(s"DELETE FROM $catName.db.mirror WHERE v % 30 = 0")
      spark.sql(s"INSERT INTO $catName.db.mirror VALUES (500, 'even', 5000)")
      q.processAllAvailable()
      mirrorEqualsSource()
    } finally q.stop()
  }

  test("refusals: no snapshot log; endingVersion on a stream") {
    val plain = Files.createTempDirectory("graft_cdf_nolog_").toString + "/t"
    spark.range(5).selectExpr("id", "id AS v").write.parquet(plain)
    val e = intercept[Exception] {
      cdf(plain).count()
    }
    assert(e.getMessage.contains("snapshot log"))
    val dir = createMor("badend")
    val e2 = intercept[Exception] {
      spark.readStream.format("graft")
        .option("path", dir).option("changeFeedMode", "rows")
        .option("endingVersion", "3").load()
        .writeStream.format("memory").queryName("cdc_bad")
        .outputMode(OutputMode.Append).start().processAllAvailable()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e2).exists(_.contains("batch-read bound")), messages(e2).mkString(" | "))
  }
}
