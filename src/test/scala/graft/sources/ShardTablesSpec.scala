package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.ArchiveCodec
import org.apache.spark.sql.functions._

/** The SQL shard surface: `graft-tar` batch ≡ TarShards.read, payload
 *  pruning as a pushdown, the arrival-ledger micro-batch stream
 *  (exactly-once, restart replay, throttling, quarantine), the
 *  beyond-2GB continuous-path proof, and `graft-zip` ≡ inventory. */
class ShardTablesSpec extends SparkSpec {

  private val data1 = Array.tabulate[Byte](700)(i => (i % 251).toByte)
  private val data2 = "sql shard member".getBytes

  /** Land a file atomically (dot-temp + rename): live arrival streams
   *  must never list a half-written shard. `mtime` (when >= 0) is set on
   *  the temp BEFORE the rename, so a live stream can never list the
   *  file with a fresher timestamp than the test intends. */
  private def land(dir: String, name: String, bytes: Array[Byte],
      mtime: Long = -1L): Unit = {
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val tmp = java.nio.file.Paths.get(dir, "." + name + ".tmp")
    Files.write(tmp, bytes)
    if (mtime >= 0)
      Files.setLastModifiedTime(tmp,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    Files.move(tmp, java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def shard(ids: Seq[Int]): Array[Byte] =
    ArchiveCodec.tar(ids.flatMap { j =>
      Seq((f"$j%06d.jpg", Array.tabulate[Byte](j * 3 + 5)(k => (k + j).toByte)),
        (f"$j%06d.txt", Array.tabulate[Byte](j * 2 + 1)(k => k.toByte)))
    })

  test("graft-tar batch read ≡ TarShards.read on a mixed-compression dir") {
    val spark = this.spark
    val dir = Files.createTempDirectory("graft_tarsql_").toString
    Files.write(java.nio.file.Paths.get(dir, "s0.tar"), shard(Seq(1, 2)))
    Files.write(java.nio.file.Paths.get(dir, "s1.tar.gz"),
      ArchiveCodec.gzip(shard(Seq(3))))
    Files.write(java.nio.file.Paths.get(dir, "s2.tar.zst"),
      ArchiveCodec.zstd(shard(Seq(4, 5))))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard"), col("member_name"), col("member_size"),
        col("byte_off"), col("member_type"),
        coalesce(length(col("payload")), lit(-1)).as("plen"))
      .collect().map(_.toSeq).toSet
    val viaSql = canon(spark.read.format("graft-tar").load(dir + "/*"))
    val viaRdd = canon(TarShards.read(spark, dir + "/*"))
    assert(viaSql == viaRdd)
    assert(viaSql.size == 10)
  }

  test("payload pruning is a pushdown: unselected payload = header-only walk") {
    val spark = this.spark
    val dir = Files.createTempDirectory("graft_tarprune_").toString
    Files.write(java.nio.file.Paths.get(dir, "s0.tar"), shard(Seq(1, 2, 3)))
    val noPayload = spark.read.format("graft-tar").load(dir + "/*")
      .select("member_name", "member_size")
    val plan = noPayload.queryExecution.executedPlan.toString
    assert(plan.contains("payload=false"), s"expected header-only scan in:\n$plan")
    assert(noPayload.count() == 6)
    val withPayload = spark.read.format("graft-tar").load(dir + "/*")
      .select(col("member_name"), length(col("payload")))
    assert(withPayload.queryExecution.executedPlan.toString.contains("payload=true"))
  }

  test("arrival-ledger stream: exactly-once across waves, restart replays the ledger") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarstream_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val out = root + "/out"
    def start() = spark.readStream.format("graft-tar").load(in)
      .filter(col("member_type") === "file")
      .select(col("shard"), col("member_name"), col("member_size"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", root + "/ckpt").start()
    val q1 = start()
    try {
      land(in, "w1.tar", shard(Seq(1)))
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)
      land(in, "w2.tar.gz", ArchiveCodec.gzip(shard(Seq(2, 3))))
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 6)
    } finally q1.stop()
    // restart on the same checkpoint: nothing replays, new arrivals flow
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(out).count() == 6) // no duplicates
      land(in, "w3.tar", shard(Seq(4)))
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
        .select("member_name", "member_size").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(
        ("000001.jpg", 8L), ("000001.txt", 3L), ("000002.jpg", 11L),
        ("000002.txt", 5L), ("000003.jpg", 14L), ("000003.txt", 7L),
        ("000004.jpg", 17L), ("000004.txt", 9L)))
    } finally q2.stop()
    // the ledger is the offset ground truth: segments exist under ckpt
    val ledger = new java.io.File(root + "/ckpt/sources/0/graft-tar-ledger")
    assert(!ledger.exists() || ledger.listFiles().nonEmpty,
      "ledger dir expected under the per-source checkpoint")
  }

  test("dated subdirectory layouts: the stream AND batch listings recurse") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tardated_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val out = root + "/out"
    val q = spark.readStream.format("graft-tar").load(in)
      .filter(col("member_type") === "file")
      .select(col("shard"), col("member_name"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", root + "/ckpt").start()
    try {
      // wave 1 lands under one dated dir, wave 2 under another — the
      // consumer globs NOTHING by hand; a _tmp dir stays invisible
      land(in + "/date=2026-08-01", "w1.tar", shard(Seq(1)))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)
      land(in + "/date=2026-08-02", "w2.tar", shard(Seq(2, 3)))
      land(in + "/_staging", "ignored.tar", shard(Seq(9)))
      q.processAllAvailable()
      val got = spark.read.parquet(out).collect()
        .map(r => (r.getString(0).split('/').takeRight(2).mkString("/"),
          r.getString(1))).toSet
      assert(got == Set(
        ("date=2026-08-01/w1.tar", "000001.jpg"),
        ("date=2026-08-01/w1.tar", "000001.txt"),
        ("date=2026-08-02/w2.tar", "000002.jpg"),
        ("date=2026-08-02/w2.tar", "000002.txt"),
        ("date=2026-08-02/w2.tar", "000003.jpg"),
        ("date=2026-08-02/w2.tar", "000003.txt")))
    } finally q.stop()
    // the BATCH surface walks the same dated tree (and skips _staging)
    val batch = spark.read.format("graft-tar").load(in)
      .filter(col("member_type") === "file")
    assert(batch.count() == 6)
    // and a zip inventory under dated dirs lists recursively too
    val zin = root + "/zin"
    land(zin + "/date=2026-08-01", "b.npz",
      ArchiveCodec.zipStored(Seq(("x.npy", data2))))
    land(zin + "/date=2026-08-02", "c.npz",
      ArchiveCodec.zipStored(Seq(("y.npy", data2), ("z.npy", data1))))
    assert(spark.read.format("graft-zip").load(zin).count() == 3)
  }

  test("wide lakes list on executors: distributed listing ≡ driver walk") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarwide_").toString
    // past DistributedListingThreshold dirs the per-dir listing RPCs run
    // on executors; the result must be the same name-sorted plan
    val nDirs = ShardFiles.DistributedListingThreshold + 6
    val want = (0 until nDirs).flatMap { i =>
      val d = f"$root/date=2026-$i%04d"
      Files.createDirectories(java.nio.file.Paths.get(d))
      // one dir is empty; others hold 1-2 shards + a hidden marker
      if (i == 3) Nil
      else {
        Files.write(java.nio.file.Paths.get(d, "_SUCCESS"), Array[Byte]())
        (0 until (i % 2 + 1)).map { j =>
          val name = f"s$j%d.tar"
          Files.write(java.nio.file.Paths.get(d, name), shard(Seq(j + 1)))
          s"file:$d/$name"
        }
      }
    }.sorted
    val got = ShardFiles.list(spark, root + "/date=*").map(_._1)
    assert(got == want)
    // and the SQL surface plans one partition per shard over the wide lake
    val n = spark.read.format("graft-tar").load(root + "/date=*")
      .select("shard").distinct().count()
    assert(n == want.size)
  }

  test("ledger compaction bounds segments and restart replays from the compact") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarcompact_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val out = root + "/out"
    def start() = spark.readStream.format("graft-tar")
      .option("maxFilesPerTrigger", "1")
      .option("ledgerCompactInterval", "2")
      .load(in)
      .filter(col("member_type") === "file")
      .select(col("shard"), col("member_name"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", root + "/ckpt").start()
    (1 to 6).foreach(j => land(in, f"w$j%02d.tar", shard(Seq(j))))
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(out).count() == 12)
    } finally q1.stop()
    // 6 files at 1/trigger = 6 batches; the engine commits each batch one
    // trigger late, so at least commits 1..5 landed — compaction every 2
    // must have folded the committed history: exactly one compact, and
    // only the post-fold tail of regular segments (bounded, not 6)
    def ledgerFiles() = new java.io.File(root + "/ckpt/sources/0/graft-tar-ledger")
      .listFiles().filter(f => !f.getName.startsWith(".")).toSeq
    val l1 = ledgerFiles()
    assert(l1.map(_.getName).count(_.endsWith(".compact")) == 1,
      s"one compact segment expected, got: ${l1.map(_.getName).mkString(",")}")
    val regulars1 = l1.filter(f => !f.getName.endsWith(".compact"))
    assert(regulars1.size <= 2,
      s"committed segments must fold away: ${l1.map(_.getName).mkString(",")}")
    def compactLines() = {
      val src = scala.io.Source.fromFile(
        ledgerFiles().find(_.getName.endsWith(".compact")).get)
      try src.getLines().toList finally src.close()
    }
    val lines1 = compactLines()
    assert(lines1.head.startsWith("compact\t"))
    val fold1 = lines1.head.split('\t')(1).toLong
    assert(fold1 >= 4, s"fold point $fold1 after 5+ commits at interval 2")
    // restart on the compacted checkpoint: nothing re-ingests, new flows,
    // and the next compactions keep folding (incl. the restart tail)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(out).count() == 12)
      (7 to 9).foreach(j => land(in, f"w$j%02d.tar", shard(Seq(j))))
      q2.processAllAvailable()
      assert(spark.read.parquet(out).count() == 18)
    } finally q2.stop()
    val l2 = ledgerFiles()
    assert(l2.map(_.getName).count(_.endsWith(".compact")) == 1)
    assert(l2.count(f => !f.getName.endsWith(".compact")) <= 2,
      s"segments keep folding across restarts: ${l2.map(_.getName).mkString(",")}")
    val lines2 = compactLines()
    assert(lines2.head.split('\t')(1).toLong > fold1, "the fold point advances")
    // every admitted path is still dedup-tracked (seen survives the fold)
    val q3 = start()
    try {
      q3.processAllAvailable()
      assert(spark.read.parquet(out).count() == 18)
    } finally q3.stop()
  }

  test("maxFileAge: too-old arrivals never admit, and their seen entries evict") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarage_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val out = root + "/out"
    val hour = 3600L * 1000
    val t0 = 1700000000000L // fixed epoch: the test owns every mtime
    def start() = spark.readStream.format("graft-tar")
      .option("maxFileAge", "1h")
      .option("ledgerCompactInterval", "1")
      .load(in)
      .filter(col("member_type") === "file")
      .select(col("shard"), col("member_name"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", root + "/ckpt").start()
    val q = start()
    try {
      land(in, "w1.tar", shard(Seq(1)), mtime = t0)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)
      // 2h older than the newest admitted mtime: outside the age window,
      // never admitted — and never will be
      land(in, "wold.tar", shard(Seq(2)), mtime = t0 - 2 * hour)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)
      // a much newer arrival advances the watermark past w1's mtime:
      // w1 becomes evictable from `seen` (it can't re-admit — the age
      // gate now rejects its mtime) and the next compaction drops it
      land(in, "wnew.tar", shard(Seq(3)), mtime = t0 + 2 * hour)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 4)
      // a late file with a pre-watermark mtime is rejected by AGE (not by
      // the seen-set): stale backfills can't sneak under the watermark
      land(in, "wlate.tar", shard(Seq(4)), mtime = t0)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 4)
      // one more in-window arrival forces a commit+compaction that
      // observes the advanced watermark
      land(in, "wnew2.tar", shard(Seq(5)), mtime = t0 + 2 * hour)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 6)
    } finally q.stop()
    // the latest compact holds only watermark-surviving entries: w1 (and
    // the never-admitted wold/wlate) are gone, the fresh files remain
    val ledger = new java.io.File(root + "/ckpt/sources/0/graft-tar-ledger")
      .listFiles().filter(_.getName.endsWith(".compact"))
    assert(ledger.length == 1)
    val src = scala.io.Source.fromFile(ledger.maxBy(_.getName))
    val lines = try src.getLines().toList finally src.close()
    assert(lines.count(_.contains("wnew.tar")) == 1)
    assert(!lines.exists(_.contains("w1.tar")),
      s"evicted entry survived compaction: $lines")
    assert(!lines.exists(_.contains("wold.tar")))
    // restart: the bounded seen-set still dedups (nothing re-ingests)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(out).count() == 6)
    } finally q2.stop()
  }

  test("latestFirst + trigger cap disables the age gate: the whole backlog drains") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarlatest_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val hour = 3600L * 1000
    val t0 = 1700000000000L
    // a backlog whose mtimes span 4x the age window: newest-first
    // draining admits w4 first, so a live watermark would permanently
    // reject w1-w3 — FileStreamSource ignores maxFileAge in exactly the
    // latestFirst+cap configuration, and so must we
    for (i <- 1 to 4)
      land(in, s"w$i.tar", shard(Seq(i)), mtime = t0 + i * hour)
    val out = root + "/out"
    val q = spark.readStream.format("graft-tar")
      .option("maxFileAge", "1h")
      .option("latestFirst", "true")
      .option("maxFilesPerTrigger", "1")
      .load(in)
      .filter(col("member_type") === "file")
      .select(col("shard"), col("member_name"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", root + "/ckpt").start()
    try {
      q.processAllAvailable()
      val got = spark.read.parquet(out)
      assert(got.count() == 8, "age gate dropped part of the backlog")
      assert(got.select("shard").distinct().count() == 4)
    } finally q.stop()
  }

  test("a hidden-named ROOT dir lists on both surfaces; hidden children stay out") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarhidden_").toString
    val in = root + "/_ingest" // the user POINTED us here; it must list
    land(in, "a.tar", shard(Seq(1)))
    land(in + "/_tmp", "b.tar", shard(Seq(2))) // hidden CHILD: metadata
    assert(spark.read.format("graft-tar").load(in)
      .filter(col("member_type") === "file").count() == 2)
    val out = root + "/out"
    val q = spark.readStream.format("graft-tar").load(in)
      .filter(col("member_type") === "file")
      .select(col("shard"), col("member_name"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", root + "/ckpt").start()
    try {
      q.processAllAvailable()
      val got = spark.read.parquet(out).collect()
      assert(got.length == 2, s"hidden-named root did not stream: ${got.toSeq}")
      assert(got.forall(!_.getString(0).contains("_tmp")))
    } finally q.stop()
  }

  test("agePruneDirs skips aged-out dated subtrees from the per-trigger walk") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarprune_").toString
    val in = root + "/in"
    val hour = 3600L * 1000
    val t0 = 1700000000000L
    def setDirMtime(d: String, m: Long): Unit =
      Files.setLastModifiedTime(java.nio.file.Paths.get(d),
        java.nio.file.attribute.FileTime.fromMillis(m))
    def run(out: String, ckpt: String, prune: Boolean): Long = {
      val q = spark.readStream.format("graft-tar")
        .option("maxFileAge", "1h")
        .option("agePruneDirs", prune.toString)
        .load(in)
        .filter(col("member_type") === "file")
        .select(col("shard"), col("member_name"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try { q.processAllAvailable() } finally q.stop()
      spark.read.parquet(out).count()
    }
    land(in + "/date=A", "a.tar", shard(Seq(1)), mtime = t0)
    setDirMtime(in + "/date=A", t0)
    land(in + "/date=B", "b.tar", shard(Seq(2)), mtime = t0 + 2 * hour)
    setDirMtime(in + "/date=B", t0 + 2 * hour)
    // first pass admits both waves; the watermark lands at t0+1h — past
    // date=A's mtime, so the aged subtree stops being WALKED at all
    assert(run(root + "/out1", root + "/ckpt1", prune = true) == 4)
    // a file smuggled into the aged dir WITH the dir mtime reset old is
    // exactly the synthetic-directory hazard the option documents: the
    // pruned walk never sees it (this is the opt-in's contract boundary,
    // and the proof the subtree truly isn't listed)
    land(in + "/date=A", "c.tar", shard(Seq(3)), mtime = t0 + 2 * hour)
    setDirMtime(in + "/date=A", t0)
    land(in + "/date=B", "d.tar", shard(Seq(4)), mtime = t0 + 2 * hour)
    setDirMtime(in + "/date=B", t0 + 2 * hour)
    assert(run(root + "/out1", root + "/ckpt1", prune = true) == 6,
      "active subtree must keep admitting; pruned subtree must not")
    // the default (no pruning) walks everything: a fresh consumer sees
    // the smuggled file too
    assert(run(root + "/out2", root + "/ckpt2", prune = false) == 8)
  }

  test("a bad option fails LOUDLY at plan time, even under permissive") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_taropt_").toString
    land(root, "a.tar", shard(Seq(1)))
    // reader-side, a zero cap would throw the same exception shape as
    // corrupt data and permissive would quarantine every shard — the
    // config error must surface on the DRIVER instead
    val e = intercept[Exception] {
      spark.read.format("graft-tar")
        .option("permissive", "true").option("maxMemberBytes", "0")
        .load(root).count()
    }
    assert(e.getMessage.contains("maxMemberBytes"), e.getMessage)
  }

  test("pathological nesting past the depth cap aborts loudly, never truncates") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tardeep_").toString
    val deep = (1 to ShardFiles.MaxListDepth + 2)
      .foldLeft(root)((d, i) => d + s"/n$i")
    land(deep, "a.tar", shard(Seq(1)))
    val e = intercept[Exception] {
      ShardFiles.list(spark, root)
    }
    assert(e.getMessage.contains("nesting exceeds"), e.getMessage)
  }

  test("maxFilesPerTrigger throttles admission; backlog drains over triggers") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarthrottle_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    for (k <- 0 until 4)
      Files.write(java.nio.file.Paths.get(in, s"s$k.tar"), shard(Seq(k + 1)))
    val q = spark.readStream.format("graft-tar")
      .option("maxFilesPerTrigger", "1").load(in)
      .filter(col("member_type") === "file")
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("tar_throttle")
      .outputMode("complete")
      .option("checkpointLocation", root + "/ckpt").start()
    try {
      q.processAllAvailable()
      // all 4 drained, one file per micro-batch
      assert(spark.sql("SELECT count(*) FROM tar_throttle").head().getLong(0) == 4)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
        "expected at least 4 non-empty micro-batches under the throttle")
    } finally q.stop()
    // pathGlobFilter keeps working from the binaryFile days: a README in
    // the landing dir must not be parsed as a shard
    Files.write(java.nio.file.Paths.get(in, "README.md"), "notes".getBytes)
    val q2 = spark.readStream.format("graft-tar")
      .option("pathGlobFilter", "*.tar").load(in)
      .filter(col("member_type") === "file")
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("tar_glob")
      .outputMode("complete")
      .option("checkpointLocation", root + "/ckpt2").start()
    try {
      q2.processAllAvailable() // would FAILFAST-poison if README ingested
      assert(spark.sql("SELECT count(*) FROM tar_glob").head().getLong(0) == 4)
    } finally q2.stop()
  }

  test("permissive stream quarantines corrupt shards (header AND decompressor); FAILFAST poisons") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarquar_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    Files.write(java.nio.file.Paths.get(in, "good.tar"), shard(Seq(1)))
    // corrupt HEADER mid-shard: member 1 survives, member 2's checksum lies
    val halfBad = ArchiveCodec.tar(Seq(
      ("x/000001.txt", Array[Byte](1, 2, 3)),
      ("x/000002.txt", Array.fill[Byte](5)(9))))
    halfBad(1024 + 148) = (halfBad(1024 + 148) ^ 1).toByte
    Files.write(java.nio.file.Paths.get(in, "halfbad.tar"), halfBad)
    // corrupt DECOMPRESSOR stream: truncated gzip (IOException, the
    // ADVICE poison-pill case) and a byte-flipped zstd frame
    val gz = ArchiveCodec.gzip(shard(Seq(2, 3)))
    Files.write(java.nio.file.Paths.get(in, "trunc.tar.gz"),
      gz.take(gz.length / 2))
    val zst = ArchiveCodec.zstd(shard(Seq(4)))
    zst(zst.length / 2) = (zst(zst.length / 2) ^ 0x55).toByte
    Files.write(java.nio.file.Paths.get(in, "flip.tar.zst"), zst)
    // corrupt gzip HEADER: GZIPInputStream validates it at CONSTRUCTION,
    // so this throws before the first member — must quarantine too
    val hdrBad = ArchiveCodec.gzip(shard(Seq(5)))
    hdrBad(2) = 0x07 // unsupported compression method
    Files.write(java.nio.file.Paths.get(in, "hdrbad.tar.gz"), hdrBad)

    val q = TarShards.readWebDatasetStream(spark, in, permissive = true)
      .select(col("shard"), col("member_name"), col("member_size"))
      .writeStream.format("memory").queryName("tar_quar")
      .option("checkpointLocation", root + "/ckpt").start()
    try {
      q.processAllAvailable() // must not throw: corruption is quarantined
      val rows = spark.sql("SELECT shard, member_name FROM tar_quar").collect()
        .map(r => (r.getString(0).split('/').last, r.getString(1)))
      // the good shard is complete; the half-bad shard kept its prefix
      assert(rows.count(_._1 == "good.tar") == 2)
      assert(rows.filter(_._1 == "halfbad.tar").map(_._2).toSeq ==
        Seq("x/000001.txt"))
      // decompressor-corrupt shards contribute only pre-corruption members
      assert(rows.forall(r => r._1 != "flip.tar.zst" || r._2.nonEmpty))
      // the header-corrupt gzip shard contributes nothing but did not
      // poison the stream (the constructor-time quarantine)
      assert(!rows.exists(_._1 == "hdrbad.tar.gz"))
    } finally q.stop()

    // the quarantine is DATA-shaped only: a generic IOException (transient
    // s3/hdfs failure on a healthy shard) must fail the task for retry,
    // never silently drop the shard's tail
    import graft.sources.ShardQuarantine.dataShaped
    assert(!dataShaped(new java.io.IOException("connection reset")))
    assert(!dataShaped(new java.io.InterruptedIOException("timeout")))
    assert(dataShaped(new java.util.zip.ZipException("corrupt gzip")))
    assert(dataShaped(new java.io.EOFException("truncated")))
    assert(dataShaped(new IllegalArgumentException("malformed tar")))
    assert(dataShaped(new com.github.luben.zstd.ZstdIOException(1L, "bad frame")))

    // FAILFAST twin: the corrupt shard fails the stream (poison pill)
    val q2 = TarShards.readWebDatasetStream(spark, in)
      .writeStream.format("memory").queryName("tar_poison")
      .option("checkpointLocation", root + "/ckpt2").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(2000)
    }
    q2.stop()
    assert(e != null)
  }

  test("a >2GB shard streams on the CONTINUOUS path (no whole-shard row)") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarbig_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    // 22 x 100 MB members = ~2.2 GB on disk: unrepresentable as a
    // BinaryType row (2 GB array cap), which is exactly what the old
    // binaryFile-based stream delivered per file
    val memberSize = 100 * 1024 * 1024
    val n = 22
    val big = java.nio.file.Paths.get(in, "big.tar")
    val out = java.nio.file.Files.newOutputStream(big)
    try {
      val payload = new Array[Byte](1 << 20)
      for (k <- 0 until n) {
        out.write(ArchiveCodec.tarHeader(f"m$k%05d.bin", memberSize, '0'))
        for (_ <- 0 until memberSize / payload.length) out.write(payload)
      }
      out.write(new Array[Byte](1024))
    } finally out.close()
    assert(java.nio.file.Files.size(big) > Int.MaxValue.toLong)
    val q = spark.readStream.format("graft-tar")
      .option("maxMemberBytes", memberSize.toString).load(in)
      .filter(col("member_type") === "file")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(col("member_size")).as("bytes"))
      .writeStream.format("memory").queryName("tar_big")
      .outputMode("complete")
      .option("checkpointLocation", root + "/ckpt").start()
    try {
      q.processAllAvailable()
      val r = spark.sql("SELECT n, bytes FROM tar_big").head()
      assert(r.getLong(0) == n.toLong)
      assert(r.getLong(1) == n.toLong * memberSize)
      assert(r.getLong(1) > Int.MaxValue.toLong)
    } finally {
      q.stop()
      java.nio.file.Files.deleteIfExists(big)
    }
  }

  test("graft-zip arrival stream: per-batch inventory, exactly-once, whole-archive quarantine") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_zipstream_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val q = ZipShards.inventoryStream(spark, in, permissive = true)
      .writeStream.format("memory").queryName("zip_stream")
      .option("checkpointLocation", root + "/ckpt").start()
    try {
      land(in, "b0.npz",
        ArchiveCodec.zipStored(Seq(("arr_0.npy", data1), ("meta.txt", data2))))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM zip_stream").head().getLong(0) == 2)
      // wave 2: a good deflated bundle + a corrupt one (quarantined WHOLE)
      land(in, "b1.npz", ArchiveCodec.zipMixed(Seq(("arr_1.npy", data1, 8))))
      land(in, "junk.npz", "not a zip archive at all, definitely".getBytes)
      q.processAllAvailable() // permissive: must not throw
      val names = spark.sql("SELECT shard, member_name FROM zip_stream").collect()
        .map(r => (r.getString(0).split('/').last, r.getString(1))).toSet
      assert(names == Set(("b0.npz", "arr_0.npy"), ("b0.npz", "meta.txt"),
        ("b1.npz", "arr_1.npy")))
    } finally q.stop()
    // the streamed inventory rows drive the same fetch as the batch rows
    val inv = spark.read.format("graft-zip").load(in + "/b1.npz")
    val fetched = ZipShards.fetchStored(inv).select("payload").head()
      .getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(fetched, data1))
    // FAILFAST twin: the corrupt bundle poisons the stream
    val q2 = ZipShards.inventoryStream(spark, in)
      .writeStream.format("memory").queryName("zip_poison")
      .option("checkpointLocation", root + "/ckpt2").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(2000)
    }
    q2.stop()
    assert(e != null)
  }

  test("frozen admission length bounds the walk: post-admission growth is detected") {
    val spark = this.spark
    val dir = Files.createTempDirectory("graft_tarfrozen_").toString
    val two = ArchiveCodec.tar(Seq(
      ("a.bin", data2), ("b.bin", Array.fill[Byte](100)(7))))
    val p = java.nio.file.Paths.get(dir, "grow.tar")
    Files.write(p, two)
    val frozenLen = two.length.toLong
    // a producer "appends" a third member AFTER admission — tar append
    // overwrites the old trailer, so bytes INSIDE the frozen window
    // change: the honest guarantee is that a replay never reads past
    // the admitted length and the mutation surfaces LOUDLY, never as
    // silently different rows
    val three = ArchiveCodec.tar(Seq(
      ("a.bin", data2), ("b.bin", Array.fill[Byte](100)(7)),
      ("c.bin", Array.fill[Byte](2000)(9))))
    Files.write(p, three)
    val factory = new TarMemberReaderFactory(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()),
      TarShards.schema, 1L << 20, withPayload = true, permissive = false)
    def namesOf(part: TarShardPartition): Seq[String] = {
      val r = factory.createReader(part)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      try while (r.next()) out += r.get().getUTF8String(1).toString
      finally r.close()
      out.toSeq
    }
    // the bounded walk hits the frozen limit inside c's payload: loud
    val e = intercept[IllegalArgumentException](
      namesOf(TarShardPartition(p.toString, frozenLen)))
    assert(e.getMessage.contains("EOF"))
    // without a frozen length (-1) the reader walks to current EOF
    assert(namesOf(TarShardPartition(p.toString)) ==
      Seq("a.bin", "b.bin", "c.bin"))
    // an UNMODIFIED shard replays identically under its frozen length
    val p2 = java.nio.file.Paths.get(dir, "stable.tar")
    Files.write(p2, two)
    assert(namesOf(TarShardPartition(p2.toString, frozenLen)) ==
      Seq("a.bin", "b.bin"))
  }

  test("pre-length ledger segments (bare paths) replay; ledger gaps abort loudly") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_tarledger_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    Files.write(java.nio.file.Paths.get(in, "old.tar"), shard(Seq(1)))
    // hand-write an OLD-FORMAT ledger segment (bare path, no length)
    val ckpt = root + "/ckpt/sources/0"
    val ledger = java.nio.file.Paths.get(ckpt, "graft-tar-ledger")
    Files.createDirectories(ledger)
    Files.write(ledger.resolve("0" * 20),
      ("file:" + in + "/old.tar\n").getBytes("UTF-8"))
    val s0 = new ArrivalLedgerStream(spark, in, ckpt, "graft-tar",
      null, (p, l) => TarShardPartition(p, l), None)
    // the replayed file resolves with len unknown (-1) and is SEEN:
    // latestOffset must not re-admit it
    val off = s0.latestOffset()
    assert(off.json() == """{"files":1}""")
    val parts = s0.planInputPartitions(s0.initialOffset(), off)
    assert(parts.toSeq == Seq(TarShardPartition("file:" + in + "/old.tar", -1L)))
    // a GAP in ledger segments is a corrupt checkpoint: abort loudly
    val ckpt2 = root + "/ckpt2/sources/0"
    val ledger2 = java.nio.file.Paths.get(ckpt2, "graft-tar-ledger")
    Files.createDirectories(ledger2)
    Files.write(ledger2.resolve("0" * 19 + "5"),
      s"10\t$in/old.tar\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      new ArrivalLedgerStream(spark, in, ckpt2, "graft-tar",
        null, (p, l) => TarShardPartition(p, l), None))
    assert(e.getMessage.contains("ledger gap"))
  }

  test("graft-zip SQL inventory ≡ ZipShards.inventory") {
    val spark = this.spark
    val dir = Files.createTempDirectory("graft_zipsql_").toString
    Files.write(java.nio.file.Paths.get(dir, "b0.npz"),
      ArchiveCodec.zipStored(Seq(("arr_0.npy", data1), ("meta.txt", data2))))
    Files.write(java.nio.file.Paths.get(dir, "b1.npz"),
      ArchiveCodec.zipMixed(Seq(("arr_1.npy", data1, 8))))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val viaSql = canon(spark.read.format("graft-zip").load(dir + "/*.npz"))
    val viaRdd = canon(ZipShards.inventory(spark, dir + "/*.npz"))
    assert(viaSql == viaRdd)
    assert(viaSql.size == 3)
    // ...and the SQL rows drive the same fetch
    val fetched = ZipShards.fetchStored(
        spark.read.format("graft-zip").load(dir + "/*.npz")
          .filter(col("member_name") === "arr_1.npy"))
      .select("payload").head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(fetched, data1))
  }
}
