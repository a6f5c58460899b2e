package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.Files

import graft.SparkSpec
import graft.functions.{ArchiveCodec, TarHeaders}
import org.apache.spark.sql.functions._

/** Streaming tar/WebDataset shard source: streamed ≡ blob walk on the
 *  same shards, compression sniffing, GNU/PAX name semantics through the
 *  stream path, FAILFAST, and the beyond-2GB O(member)-memory proof. */
class TarShardsSpec extends SparkSpec {

  private val data1 = Array.tabulate[Byte](700)(i => (i % 251).toByte)
  private val data2 = "streamed member".getBytes

  test("streamed members match the blob walk exactly (names, sizes, offsets, payloads)") {
    val shard = ArchiveCodec.tar(Seq(
      ("000001.jpg", data1), ("000001.txt", data2), ("sub/000002.jpg", data2)))
    val streamed = TarShards.members(
      new ByteArrayInputStream(shard), "mem").toList
    val blob = TarHeaders.entries(shard)
    assert(streamed.map(_.name) == blob.map(_.name).toList)
    assert(streamed.map(_.size) == blob.map(_.size).toList)
    assert(streamed.map(_.byteOff) == blob.map(_.offset).toList)
    assert(streamed.map(_.typ) == blob.map(_.typ).toList)
    // payloads are the actual member bytes
    assert(java.util.Arrays.equals(streamed.head.payload, data1))
    assert(java.util.Arrays.equals(streamed(1).payload, data2))
  }

  test("gzip and zstd shards stream through magic sniffing; dirs carry no payload") {
    val shard = ArchiveCodec.tarTyped(Seq(
      ("d/", Array.emptyByteArray, '5'), ("d/a.bin", data2, '0')))
    for (wrap <- Seq[Array[Byte] => Array[Byte]](
        identity, ArchiveCodec.gzip(_), ArchiveCodec.zstd(_))) {
      val ms = TarShards.members(
        new ByteArrayInputStream(wrap(shard)), "mem").toList
      assert(ms.map(m => (m.name, m.typ)) ==
        List(("d/", "dir"), ("d/a.bin", "file")))
      assert(ms.head.payload == null)
      assert(java.util.Arrays.equals(ms(1).payload, data2))
      // offsets are UNCOMPRESSED-stream offsets in every wrapping (the
      // zero-size dir entry occupies only its 512-byte header block)
      assert(ms.map(_.byteOff) == List(512L, 1024L))
    }
  }

  test("GNU longname and PAX path overrides ride the stream walk") {
    val pax = ArchiveCodec.tarTyped(Seq(
      ("././@PaxHeader", ArchiveCodec.paxPayload("deep/override.bin"), 'x'),
      ("short.bin", data2, '0'),
      ("plain.bin", data2, '0')))
    val ms = TarShards.members(new ByteArrayInputStream(pax), "mem").toList
    assert(ms.map(_.name) == List("deep/override.bin", "plain.bin"))
    // ...and matches the blob walk
    assert(TarHeaders.entries(pax).map(_.name).toList == ms.map(_.name))
  }

  test("FAILFAST: corrupt mid-stream header aborts with shard + member index") {
    val shard = ArchiveCodec.tar(Seq(("a.bin", data2), ("b.bin", data1)))
    val bad = shard.clone()
    bad(1024 + 148) = (bad(1024 + 148) ^ 1).toByte // b.bin's checksum (a.bin spans 512+512)
    val it = TarShards.members(new ByteArrayInputStream(bad), "shard-7.tar")
    val e = intercept[IllegalArgumentException](it.toList)
    assert(e.getMessage.contains("shard-7.tar"))
    assert(e.getMessage.contains("member 1"))
    // over-cap member: FAILFAST, not a silent skip
    val big = TarShards.members(
      new ByteArrayInputStream(shard), "mem", maxMemberBytes = 100)
    val e2 = intercept[IllegalArgumentException](big.toList)
    assert(e2.getMessage.contains("exceeds cap"))
  }

  /** A virtual tar served on the fly: n members of `memberSize` zeros —
   *  the whole shard NEVER exists in memory, so iterating it proves the
   *  reader holds O(member), not O(shard). */
  private final class GeneratedTar(nMembers: Int, memberSize: Int)
      extends java.io.InputStream {
    require(memberSize % 512 == 0)
    private val span = 512L + memberSize
    val totalBytes: Long = nMembers * span + 1024
    private var pos = 0L
    private var curIdx = -1
    private var curHeader: Array[Byte] = _
    override def read(): Int = {
      val b = new Array[Byte](1)
      if (read(b, 0, 1) < 0) -1 else b(0) & 0xff
    }
    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= totalBytes) return -1
      val k = math.min((pos / span).toInt, nMembers) // trailer zone = nMembers
      val inSpan = pos - k * span
      if (k < nMembers && inSpan < 512) {
        if (k != curIdx) {
          curIdx = k
          curHeader = ArchiveCodec.tarHeader(f"m$k%05d.bin", memberSize, '0')
        }
        val n = math.min(len.toLong, 512 - inSpan).toInt
        System.arraycopy(curHeader, inSpan.toInt, buf, off, n)
        pos += n; n
      } else {
        val zoneEnd = if (k < nMembers) (k + 1) * span else totalBytes
        val n = math.min(len.toLong, zoneEnd - pos).toInt
        java.util.Arrays.fill(buf, off, off + n, 0.toByte)
        pos += n; n
      }
    }
  }

  test("a shard LARGER than the 2 GB blob cap streams with O(member) memory") {
    // 23 x 100 MB = ~2.35 GB of virtual shard — unrepresentable as a
    // BinaryType blob (hard 2 GB array cap), generated on the fly so the
    // test itself never holds more than one member either
    val memberSize = 100 * 1024 * 1024
    val gen = new GeneratedTar(23, memberSize)
    assert(gen.totalBytes > Int.MaxValue.toLong, s"shard must exceed the blob cap")
    var count = 0
    var lastOff = -1L
    TarShards.members(gen, "gen", maxMemberBytes = memberSize).foreach { m =>
      assert(m.name == f"m$count%05d.bin")
      assert(m.size == memberSize.toLong)
      assert(m.byteOff == count * (512L + memberSize) + 512L)
      assert(m.payload.length == memberSize)
      lastOff = m.byteOff
      count += 1
    }
    assert(count == 23)
    assert(lastOff + memberSize > Int.MaxValue.toLong) // truly past the cap
  }

  test("inventory + fetchMembers: payload-free listing, then seek-read only survivors") {
    val spark = this.spark
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_tarfetch_").toString
    val jpg1 = Array.tabulate[Byte](700)(i => (i % 113).toByte)
    val jpg2 = Array.tabulate[Byte](1200)(i => (i % 97).toByte)
    val jpg3 = Array.tabulate[Byte](300)(i => (i % 89).toByte)
    val s0 = ArchiveCodec.tar(Seq(
      ("a.jpg", jpg1), ("a.txt", data2), ("b.jpg", jpg2)))
    val s1 = ArchiveCodec.tar(Seq(("c.jpg", jpg3), ("c.txt", data2)))
    Files.write(java.nio.file.Paths.get(dir, "shard-0.tar"), s0)
    Files.write(java.nio.file.Paths.get(dir, "shard-1.tar"), s1)
    val inv = TarShards.inventory(spark, dir + "/*")
    // the inventory lists everything but materializes NO payload
    assert(inv.count() == 5)
    assert(inv.select("payload").collect().forall(_.isNullAt(0)))
    // a tiny cap doesn't gate the payload-free walk (nothing allocates)
    val big = TarShards.members(new ByteArrayInputStream(s0), "mem",
      maxMemberBytes = 10, withPayload = false).toList
    assert(big.map(_.name) == List("a.jpg", "a.txt", "b.jpg"))
    // select only the jpgs and seek-read exactly those
    val fetched = TarShards.fetchMembers(
        inv.filter(col("member_name").endsWith(".jpg")))
      .select("member_name", "payload").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(fetched.keySet == Set("a.jpg", "b.jpg", "c.jpg"))
    assert(java.util.Arrays.equals(fetched("a.jpg"), jpg1))
    assert(java.util.Arrays.equals(fetched("b.jpg"), jpg2))
    assert(java.util.Arrays.equals(fetched("c.jpg"), jpg3))
  }

  test("writeShards refuses null keys, names, and payloads loudly") {
    val spark = this.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tarnull_").toString + "/shards"
    def export(rows: Seq[(String, String, Array[Byte])]): Unit =
      TarShards.writeShards(rows.toDF("sample_key", "member_name", "payload"),
        dir, overwrite = true).collect()
    val good = ("k1", "m1.bin", Array[Byte](1, 2))
    for ((bad, msg) <- Seq(
        ((null, "m0.bin", Array[Byte](3)), "null sample key"),
        (("k0", null, Array[Byte](3)), "null member name"),
        (("k0", "m0.bin", null), "null payload"))) {
      val e = intercept[org.apache.spark.SparkException] {
        export(Seq(good, bad))
      }
      // a null would otherwise corrupt the manifest's sample count or
      // NPE deep inside the tar writer — the refusal must carry context
      assert(e.getMessage.contains(msg) ||
        Option(e.getCause).exists(_.getMessage.contains(msg)), e.getMessage)
    }
  }

  test("writeShards: size caps, sample integrity, read-back ≡ input, idempotent retries") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_tarwrite_").toString + "/shards"
    val input = (0 until 30).flatMap { s =>
      val key = f"d$s%04d"
      (1 to (s % 3 + 1)).map { j =>
        (key, s"$key.$j.bin",
          Array.tabulate[Byte](s * 37 + j * 11 + 40)(k => ((k + s + j) % 251).toByte))
      }
    }
    val df = input.toDF("sample_key", "member_name", "payload")
    val manifest = TarShards.writeShards(df, dir,
      targetShardBytes = 4096, shardPartitions = 4).collect()
    // the manifest is the disk truth: names, counts, exact byte sizes
    // (.crc sidecars are the local ChecksumFileSystem's, not shards)
    val onDisk = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar"))
      .map(f => f.getPath -> f.length()).toMap
    assert(manifest.map(_.getString(0).stripPrefix("file:")).toSet ==
      onDisk.keySet)
    for (m <- manifest)
      assert(m.getLong(3) == onDisk(m.getString(0).stripPrefix("file:")))
    assert(manifest.map(_.getLong(1)).sum == input.size)
    assert(manifest.map(_.getLong(2)).sum == 30)
    assert(manifest.length > 4, "the 4 KB cap must roll multiple shards")
    // a shard may run at most ONE sample past the target
    val maxSample = input.groupBy(_._1).values
      .map(_.map(m => 512 + ((m._3.length + 511) / 512) * 512).sum).max
    assert(manifest.forall(_.getLong(3) <= 4096 + maxSample + 1024))
    // read-back: every member, byte-for-byte, each sample in ONE shard
    val back = TarShards.readWebDataset(spark, dir + "/*")
    val gotPayloads = back.select("member_name", "payload").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(gotPayloads.keySet == input.map(_._2).toSet)
    for ((_, name, p) <- input)
      assert(java.util.Arrays.equals(gotPayloads(name), p))
    val split = back.groupBy(col("sample_key"))
      .agg(countDistinct(col("shard")).as("n"))
      .filter(col("n") > 1).count()
    assert(split == 0, "a sample must never split across shards")
    // a dirty target dir refuses (stale part files would ghost dropped
    // samples into the read-back glob) unless overwrite clears it...
    val e0 = intercept[IllegalArgumentException](
      TarShards.writeShards(df, dir, targetShardBytes = 4096,
        shardPartitions = 4))
    assert(e0.getMessage.contains("part files"))
    // ...and the overwrite rerun (a retried job) rewrites identical bytes
    val again = TarShards.writeShards(df, dir,
      targetShardBytes = 4096, shardPartitions = 4,
      overwrite = true).collect()
    assert(again.map(r => (r.getString(0), r.getLong(3))).sorted.toSeq ==
      manifest.map(r => (r.getString(0), r.getLong(3))).sorted.toSeq)
    // duplicate (key, name) rows have no stable tie order across task
    // attempts — refused loudly, never nondeterministic bytes
    val dup = Seq(("k", "m.bin", Array[Byte](1)), ("k", "m.bin", Array[Byte](2)))
      .toDF("sample_key", "member_name", "payload")
    val eDup = intercept[org.apache.spark.SparkException](
      TarShards.writeShards(dup, dir + "3").collect())
    assert(eDup.getMessage.contains("duplicate member") ||
      eDup.getCause != null && eDup.getCause.getMessage.contains("duplicate member"))
    // names past ustar's 100-byte field travel as PAX path overrides
    // (URL-shaped sample keys) and round-trip through every reader
    val longName = "https/example.org/some/very/deep/crawl/path/" + ("x" * 80) + ".txt"
    // non-ASCII twin: UTF-8 bytes > chars, pinning the byte-counted PAX
    // record length through the full export → ingest loop
    val utf8Name = "https/example.org/ünïcode/" + ("é" * 60) + ".txt"
    val longDf = Seq(
      ("k", longName, Array[Byte](1, 2, 3, 4)),
      ("k2", utf8Name, Array[Byte](9, 8, 7))).toDF(
      "sample_key", "member_name", "payload")
    TarShards.writeShards(longDf, dir + "2").collect()
    val longBack = TarShards.read(spark, dir + "2/*")
      .filter(col("member_type") === "file")
      .select("member_name", "payload").collect()
    assert(longBack.map(_.getString(0)).toSet == Set(longName, utf8Name))
    val byName = longBack.map(r =>
      r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(byName(longName), Array[Byte](1, 2, 3, 4)))
    assert(java.util.Arrays.equals(byName(utf8Name), Array[Byte](9, 8, 7)))
    // tmp+rename commit: no dot-temp shard survives a successful export
    assert(new java.io.File(dir + "2").listFiles()
      .forall(f => !f.getName.endsWith(".tmp")))
    // compressed export: gzip and zstd shards read back identically
    // (magic-sniffed), manifest bytes = on-disk (compressed) sizes
    for (comp <- Seq("gzip", "zstd")) {
      val cdir = dir + "-" + comp
      val m = TarShards.writeShards(df, cdir, targetShardBytes = 4096,
        shardPartitions = 4, compression = comp).collect()
      val wantExt = if (comp == "gzip") ".tar.gz" else ".tar.zst"
      assert(m.forall(_.getString(0).endsWith(wantExt)))
      val disk = new java.io.File(cdir).listFiles()
        .filter(_.getName.endsWith(wantExt))
        .map(f => f.getPath -> f.length()).toMap
      for (r <- m)
        assert(r.getLong(3) == disk(r.getString(0).stripPrefix("file:")))
      val got = TarShards.readWebDataset(spark, cdir + "/*")
        .select("member_name", "payload").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(got.keySet == input.map(_._2).toSet)
      for ((_, name, p) <- input)
        assert(java.util.Arrays.equals(got(name), p), s"$comp $name diverges")
    }
  }

  test("hot-shard fetch salting: one shard fans across tasks, offsets ordered per task") {
    val spark = this.spark
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_tarsalt_").toString
    val members = (0 until 48).map(k =>
      (f"m$k%03d.bin", Array.fill[Byte](600)((k % 100).toByte)))
    Files.write(java.nio.file.Paths.get(dir, "hot.tar"),
      ArchiveCodec.tar(members))
    val inv = TarShards.inventory(spark, dir + "/*")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("member_name"),
        org.apache.spark.sql.functions.length(col("payload")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val plain = canon(TarShards.fetchMembers(inv))
    val salted = TarShards.fetchMembers(inv, saltRangeBytes = 8192L)
    assert(canon(salted) == plain && plain.size == 48)
    val perPart = salted.select(col("byte_off"))
      .rdd.mapPartitionsWithIndex { (i, it) =>
        Iterator.single((i, it.map(_.getLong(0)).toList))
      }.collect().filter(_._2.nonEmpty)
    assert(perPart.length > 1,
      s"expected the salted fetch to span >1 task, got ${perPart.length}")
    for ((_, offs) <- perPart) assert(offs == offs.sorted)
  }

  test("readWebDatasetStream: arriving shards parse per micro-batch, exactly once") {
    val spark = this.spark
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_wds_stream_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val q = TarShards.readWebDatasetStream(spark, in)
      .select(col("sample_key"), col("member_ext"), col("member_size"))
      .writeStream
      .format("memory").queryName("wds_stream")
      .option("checkpointLocation", root + "/ckpt")
      .start()
    try {
      Files.write(java.nio.file.Paths.get(in, "s1.tar"),
        ArchiveCodec.tar(Seq(("000001.jpg", data2), ("000001.cls", Array[Byte](7)))))
      q.processAllAvailable()
      val after1 = spark.sql("SELECT * FROM wds_stream").count()
      assert(after1 == 2)
      // the second arrival is gzip-compressed; the first is not re-read
      Files.write(java.nio.file.Paths.get(in, "s2.tar.gz"),
        ArchiveCodec.gzip(ArchiveCodec.tar(Seq(("000002.jpg", data1)))))
      q.processAllAvailable()
      val rows = spark.sql("SELECT sample_key, member_ext, member_size FROM wds_stream")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        ("000001", "jpg", data2.length.toLong),
        ("000001", "cls", 1L),
        ("000002", "jpg", data1.length.toLong)))
    } finally q.stop()
  }

  test("writeShardsStream: per-batch export, batch REPLAY is idempotent") {
    val spark = this.spark
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_wds_wstream_").toString
    val in = root + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val out = root + "/out"
    def wave(w: Int): Unit = Files.write(
      java.nio.file.Paths.get(in, s"w$w.tar"),
      ArchiveCodec.tar((1 to 3).flatMap { j =>
        Seq((f"w$w%d-$j%02d.jpg", Array.fill[Byte](w * 10 + j)(3)),
          (f"w$w%d-$j%02d.txt", Array.fill[Byte](j)(5)))
      }))
    def start() = TarShards.writeShardsStream(
      TarShards.readWebDatasetStream(spark, in)
        .select(col("sample_key"), col("member_name"), col("payload")),
      out, root + "/sinkckpt", targetShardBytes = 1 << 20,
      shardPartitions = 2, compression = "gzip")
    val q1 = start()
    try {
      wave(1)
      q1.processAllAvailable()
      wave(2)
      q1.processAllAvailable()
    } finally q1.stop()
    def snapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(out))
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".tar.gz"))
        .map(f => f.getPath.stripPrefix(out) -> f.length()).toMap
    }
    val firstRun = snapshot()
    assert(firstRun.keys.exists(_.startsWith("/batch=")), "per-batch subdirs")
    def readBack() = TarShards.readWebDataset(spark, out + "/batch=*/*")
      .select("member_name", "member_size").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val want = (for (w <- 1 to 2; j <- 1 to 3) yield Seq(
      (f"w$w%d-$j%02d.jpg", (w * 10 + j).toLong),
      (f"w$w%d-$j%02d.txt", j.toLong))).flatten.toSet
    assert(readBack() == want)
    // the recursive SQL surface takes the whole lake with NO glob and
    // skips the dot-prefixed manifest tree
    assert(spark.read.format("graft-tar").load(out)
      .filter(col("member_type") === "file").count() == 12)
    // manifests persisted, dot-prefixed: invisible to the shard readers
    assert(new java.io.File(out + "/.manifests").exists())
    val manifested = spark.read.parquet(out + "/.manifests/*")
      .agg(org.apache.spark.sql.functions.sum("n_members")).head().getLong(0)
    assert(manifested == 12L)
    // REPLAY: drop the sink's last commit record — on restart the engine
    // re-runs that batch against the same ledger range, and foreachBatch
    // must overwrite its batch=N dir with identical files, not duplicate
    val commits = new java.io.File(root + "/sinkckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+"))
    val last = commits.maxBy(_.getName.toInt)
    assert(last.delete())
    // the local-FS checksum sidecar must go with it (HDFS/S3 checkpoints
    // have none; a stale .crc would poison the rewrite, not model replay)
    val crc = new java.io.File(last.getParent, "." + last.getName + ".crc")
    if (crc.exists()) assert(crc.delete())
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(snapshot() == firstRun, "replayed batch must rewrite identical files")
    assert(readBack() == want)
  }

  test("Spark source: mixed-compression shard dir, streamed ≡ webdatasetSamples") {
    val spark = this.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tarshards_").toString
    // each shard carries an INCOMPRESSIBLE 5 MB filler so the on-disk
    // files exceed spark.files.openCostInBytes (4 MB) in every wrapping —
    // below that, binaryFiles legitimately combines files into one split
    val filler = { val b = new Array[Byte](5 * 1024 * 1024)
      new scala.util.Random(42).nextBytes(b); b }
    def shard(ids: Seq[Int]): Array[Byte] =
      ArchiveCodec.tar(ids.flatMap { j =>
        Seq((f"$j%06d.jpg", Array.tabulate[Byte](j * 3 + 5)(k => (k + j).toByte)),
          (f"$j%06d.txt", Array.tabulate[Byte](j * 2 + 1)(k => k.toByte)))
      } :+ ("fill.bin", filler))
    val raw = Seq(shard(Seq(1, 2)), shard(Seq(3)), shard(Seq(4, 5, 6)))
    Files.write(java.nio.file.Paths.get(dir, "shard-0.tar"), raw(0))
    Files.write(java.nio.file.Paths.get(dir, "shard-1.tar.gz"),
      ArchiveCodec.gzip(raw(1)))
    Files.write(java.nio.file.Paths.get(dir, "shard-2.tar.zst"),
      ArchiveCodec.zstd(raw(2)))
    val streamed = TarShards.readWebDataset(spark, dir + "/*")
      .select(col("sample_key"), col("member_ext"), col("member_size"),
        length(col("payload")).cast("long").as("plen"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // blob-based twin over the same shard bytes
    val blobs = raw.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("sid", "blob")
    val viaBlob = graft.operators.Multimodal.webdatasetSamples(blobs, "blob")
      .select(col("sample_key"), col("member_ext"), col("member_size"),
        col("member_size").as("plen"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == viaBlob)
    // 6 samples x 2 members + the filler tuple (identical across shards,
    // collapsed by the set)
    assert(streamed.size == 13)
    // file-level parallelism: binaryFiles combines TINY files into one
    // split, but a high minPartitions (small max split size) yields one
    // task per shard — the shape a lake of GB shards gets by default,
    // since a split never spans two files
    assert(TarShards.read(spark, dir + "/*", minPartitions = 1000)
      .rdd.getNumPartitions == 3)
  }
}
