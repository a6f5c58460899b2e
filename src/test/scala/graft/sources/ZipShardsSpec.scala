package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.{ArchiveCodec, NpyCodec, ZipHeaders}
import org.apache.spark.sql.functions.col

/** Seekable zip/npz shard inventory: two positioned reads per archive
 *  (EOCD tail + central directory), identical to the blob walk, and
 *  stored-member fetch through local headers. */
class ZipShardsSpec extends SparkSpec {

  private val data1 = Array.tabulate[Byte](700)(i => (i % 251).toByte)
  private val data2 = "seekable member".getBytes

  test("seekable inventory ≡ blob listing (incl. comments and zip64 chains)") {
    val spark = this.spark
    val dir = Files.createTempDirectory("graft_zipshards_").toString
    val npy = NpyCodec.encode("<f8", fortran = false, Seq(6L), 48)
    val plain = ArchiveCodec.zipStored(Seq(("arr_0.npy", npy), ("meta.txt", data2)))
    val commented = ArchiveCodec.zipStored(Seq(("a.bin", data1)),
      comment = "trailing comment with PK noise".getBytes("ISO-8859-1"))
    val z64 = ArchiveCodec.zipStored(Seq(("arr_1.npy", npy)), zip64 = true)
    Files.write(java.nio.file.Paths.get(dir, "b0.npz"), plain)
    Files.write(java.nio.file.Paths.get(dir, "b1.npz"), commented)
    Files.write(java.nio.file.Paths.get(dir, "b2.npz"), z64)
    val inv = ZipShards.inventory(spark, dir + "/*.npz")
      .collect().map(r => (r.getString(0).split('/').last, r.getString(1),
        r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // the blob walk over the same bytes is the ground truth
    val want = Seq(("b0.npz", plain), ("b1.npz", commented), ("b2.npz", z64))
      .flatMap { case (f, bytes) =>
        ZipHeaders.entries(bytes).map(e =>
          (f, e.name, e.method, e.compSize, e.size, e.localOff))
      }.toSet
    assert(inv == want)
    assert(inv.size == 4)
  }

  test("fetchStored resolves members through local headers; deflate refuses") {
    val spark = this.spark
    val dir = Files.createTempDirectory("graft_zipfetch_").toString
    val npy = NpyCodec.encode("<i8", fortran = false, Seq(3L), 24)
    Files.write(java.nio.file.Paths.get(dir, "s.npz"),
      ArchiveCodec.zipStored(Seq(("arr_0.npy", npy), ("doc.txt", data2))))
    val inv = ZipShards.inventory(spark, dir + "/*.npz")
    val fetched = ZipShards.fetchStored(
        inv.filter(col("member_name").endsWith(".npy")))
      .select("member_name", "payload").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(fetched("arr_0.npy"), npy))
    // ...and the fetched member feeds npy_meta exactly like the blob path
    assert(graft.functions.NpyHeaders.parse(fetched("arr_0.npy")).nElems == 3)
    def msgOf(e: Throwable): String =
      e.getMessage + (if (e.getCause != null) " | " + e.getCause.getMessage else "")
    // a row LYING method 8 over stored bytes fails loudly (the payload is
    // not a deflate stream), never returns silently wrong bytes
    val lied = inv.withColumn("method", org.apache.spark.sql.functions.lit(8))
    val e = intercept[org.apache.spark.SparkException](
      ZipShards.fetchStored(lied).collect())
    assert(msgOf(e).contains("did not inflate"))
    // methods other than 0/8 refuse
    val odd = inv.withColumn("method", org.apache.spark.sql.functions.lit(5))
    val e2 = intercept[org.apache.spark.SparkException](
      ZipShards.fetchStored(odd).collect())
    assert(msgOf(e2).contains("STORED/DEFLATED"))
  }

  test("fetchStored inflates DEFLATED members (savez_compressed layout)") {
    val spark = this.spark
    val dir = Files.createTempDirectory("graft_zipdeflate_").toString
    val npy = NpyCodec.encode("<i8", fortran = false, Seq(5L), 40)
    val big = Array.tabulate[Byte](5000)(i => (i % 7).toByte) // compresses well
    Files.write(java.nio.file.Paths.get(dir, "c.npz"),
      ArchiveCodec.zipMixed(Seq(
        ("arr_0.npy", npy, 8), ("blob.bin", big, 8), ("doc.txt", data2, 0))))
    // JDK's own writer (default DEFLATED) must fetch identically
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("jdk.bin"))
    zos.write(big); zos.closeEntry(); zos.close()
    Files.write(java.nio.file.Paths.get(dir, "jdk.npz"), bos.toByteArray)
    val inv = ZipShards.inventory(spark, dir + "/*.npz")
    assert(inv.filter(col("method") === 8).count() == 3)
    val fetched = ZipShards.fetchStored(inv)
      .select("member_name", "payload").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(fetched("arr_0.npy"), npy))
    assert(java.util.Arrays.equals(fetched("blob.bin"), big))
    assert(java.util.Arrays.equals(fetched("doc.txt"), data2))
    assert(java.util.Arrays.equals(fetched("jdk.bin"), big))
    assert(graft.functions.NpyHeaders.parse(fetched("arr_0.npy")).nElems == 5)
  }

  test("zip64 EOCD with a large extensible data sector: second positioned read") {
    val spark = this.spark
    val dir = Files.createTempDirectory("graft_zip64ext_").toString
    val base = ArchiveCodec.zipStored(Seq(("arr_1.npy", data1)), zip64 = true)
    // find the zip64 EOCD record and grow its extensible data sector past
    // the tail window, so the record starts BEFORE the window the
    // inventory reads — a well-formed archive the fixed window alone
    // would reject
    var z = -1
    for (i <- 0 until base.length - 4 if z < 0)
      if (base(i) == 'P' && base(i + 1) == 'K' && base(i + 2) == 6 && base(i + 3) == 6)
        z = i
    assert(z > 0)
    val pad = 80000 // > TailWindow
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, z + 56)
    out.write(new Array[Byte](pad))
    out.write(base, z + 56, base.length - z - 56)
    val grown = out.toByteArray
    // the record's "size of zip64 EOCD record" field counts everything
    // after its first 12 bytes: 44 + the extensible sector
    val newSize = 44L + pad
    for (k <- 0 until 8)
      grown(z + 4 + k) = ((newSize >> (8 * k)) & 0xff).toByte
    Files.write(java.nio.file.Paths.get(dir, "ext.npz"), grown)
    // the in-buffer blob walk accepts it (whole archive in the buffer)...
    assert(ZipHeaders.entries(grown).map(_.name).toSeq == Seq("arr_1.npy"))
    // ...and the seekable inventory resolves the out-of-window record
    // with one more positioned read instead of failing
    val inv = ZipShards.inventory(spark, dir + "/*.npz").collect()
    assert(inv.map(_.getString(1)).toSeq == Seq("arr_1.npy"))
  }

  test("over-cap or truncated central directories abort loudly, never truncate") {
    val spark = this.spark
    def msgOf(e: Throwable): String =
      e.getMessage + (if (e.getCause != null) " | " + e.getCause.getMessage else "")
    // declared count past the listing cap (zip64 count field forged)
    val dir1 = Files.createTempDirectory("graft_zipcap_").toString
    val z64 = ArchiveCodec.zipStored(Seq(("a.npy", data2)), zip64 = true)
    var z = -1
    for (i <- 0 until z64.length - 4 if z < 0)
      if (z64(i) == 'P' && z64(i + 1) == 'K' && z64(i + 2) == 6 && z64(i + 3) == 6)
        z = i
    val overCap = (ZipHeaders.MaxEntries + 1).toLong
    for (k <- 0 until 8) { // both count fields of the zip64 EOCD
      z64(z + 24 + k) = ((overCap >> (8 * k)) & 0xff).toByte // this disk
      z64(z + 32 + k) = z64(z + 24 + k) // total
    }
    Files.write(java.nio.file.Paths.get(dir1, "cap.npz"), z64)
    val e1 = intercept[org.apache.spark.SparkException](
      ZipShards.inventory(spark, dir1 + "/*.npz").collect())
    assert(msgOf(e1).contains("listing cap"))
    // classic EOCD declaring MORE members than the walk yields
    val dir2 = Files.createTempDirectory("graft_ziptrunc_").toString
    val lie = ArchiveCodec.zipStored(Seq(("a.npy", data2)))
    var e = -1
    for (i <- lie.length - 22 to 0 by -1 if e < 0)
      if (lie(i) == 'P' && lie(i + 1) == 'K' && lie(i + 2) == 5 && lie(i + 3) == 6)
        e = i
    lie(e + 8) = 2; lie(e + 10) = 2 // claims 2 members, CD holds 1
    Files.write(java.nio.file.Paths.get(dir2, "trunc.npz"), lie)
    val e2 = intercept[org.apache.spark.SparkException](
      ZipShards.inventory(spark, dir2 + "/*.npz").collect())
    assert(msgOf(e2).contains("corrupt listing"))
  }

  test("corrupt archives FAIL the listing task (no silent skips)") {
    val spark = this.spark
    val dir = Files.createTempDirectory("graft_zipbad_").toString
    Files.write(java.nio.file.Paths.get(dir, "bad.npz"),
      "definitely not a zip archive at all".getBytes)
    val e = intercept[org.apache.spark.SparkException](
      ZipShards.inventory(spark, dir + "/*.npz").collect())
    assert(e.getMessage.contains("end-of-central-directory") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("end-of-central-directory"))
  }

  test("inventoryDistributed: executor-side per-dir listing ≡ driver glob, skew respread") {
    val spark = this.spark
    val root = Files.createTempDirectory("graft_ziplake_").toString
    val npy = NpyCodec.encode("<i8", fortran = false, Seq(2L), 16)
    // 5 dirs; d0 holds MOST bundles (per-dir skew), d4 holds none
    for (d <- 0 until 5) Files.createDirectories(
      java.nio.file.Paths.get(root, s"d$d"))
    var k = 0
    for (d <- 0 until 4; _ <- 0 to (if (d == 0) 9 else 1)) {
      Files.write(java.nio.file.Paths.get(root, s"d$d", f"b$k%04d.npz"),
        ArchiveCodec.zipStored(Seq((s"arr_$k.npy", npy))))
      k += 1
    }
    // noise file the leaf pattern must exclude, and a Spark job marker
    // the hidden-file rule must exclude even under leafPattern "*"
    Files.write(java.nio.file.Paths.get(root, "d1", "notes.txt"), "x".getBytes)
    Files.write(java.nio.file.Paths.get(root, "d0", "_SUCCESS"),
      Array.emptyByteArray)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val viaDriver = canon(ZipShards.inventory(spark, root + "/*/*.npz"))
    val viaDist = canon(ZipShards.inventoryDistributed(spark, root + "/*", "*.npz"))
    assert(viaDist == viaDriver)
    assert(viaDist.size == k)
    // d0 holds npz bundles + _SUCCESS: the marker is filtered, not parsed
    val d0 = canon(ZipShards.inventoryDistributed(spark, root + "/d0", "*"))
    assert(d0 == canon(ZipShards.inventory(spark, root + "/d0/*.npz")))
    // a path expanding to FILES routes callers to inventory() instead
    val e = intercept[IllegalArgumentException](
      ZipShards.inventoryDistributed(spark, root + "/d0/*.npz"))
    assert(e.getMessage.contains("no directories"))
  }

  test("hot-bundle fetch salting fans one archive across tasks, offsets ordered per task") {
    val spark = this.spark
    val dir = Files.createTempDirectory("graft_zipsalt_").toString
    val members = (0 until 40).map(k =>
      (f"m$k%03d.bin", Array.fill[Byte](500)((k % 100).toByte)))
    Files.write(java.nio.file.Paths.get(dir, "hot.npz"),
      ArchiveCodec.zipStored(members))
    val inv = ZipShards.inventory(spark, dir + "/*.npz")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("member_name"),
        org.apache.spark.sql.functions.length(col("payload")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val plain = canon(ZipShards.fetchStored(inv))
    val salted = ZipShards.fetchStored(inv, saltRangeBytes = 4096L)
    assert(canon(salted) == plain && plain.size == 40)
    // >1 task carries rows, and each task's offsets are ascending
    val perPart = salted.select(col("local_off"))
      .rdd.mapPartitionsWithIndex { (i, it) =>
        Iterator.single((i, it.map(_.getLong(0)).toList))
      }.collect().filter(_._2.nonEmpty)
    assert(perPart.length > 1,
      s"expected the salted fetch to span >1 task, got ${perPart.length}")
    for ((_, offs) <- perPart) assert(offs == offs.sorted)
  }

  test("writeBundles round-trips stored AND deflated through every reader path") {
    import spark.implicits._
    val rows = (1 to 40).flatMap { i =>
      val npy = NpyCodec.encode("<i8", fortran = false,
        Seq(i % 5 + 1L), ((i % 5) + 1) * 8)
      Seq((f"s$i%03d", f"s$i%03d.npy", npy),
        (f"s$i%03d", f"s$i%03d.txt", Array.fill[Byte](i % 9 + 1)('m')))
    }
    val df = rows.toDF("sample_key", "member_name", "payload")
    for (method <- Seq("stored", "deflated")) {
      val dir = Files.createTempDirectory(s"graft_zipw_$method").toString + "/lake"
      val manifest = ZipShards.writeBundles(df, dir,
        targetBundleBytes = 1024, bundlePartitions = 4,
        method = method).collect()
      assert(manifest.length > 4, "size cap must roll multiple bundles")
      // manifest bytes are exact on-disk sizes; no dot-temps survive
      val disk = new java.io.File(dir).listFiles()
      assert(disk.forall(f => !f.getName.endsWith(".tmp")))
      val sizes = disk.map(f => f.getPath -> f.length()).toMap
      for (m <- manifest)
        assert(m.getLong(3) == sizes(m.getString(0).stripPrefix("file:")))
      assert(manifest.map(_.getLong(1)).sum == 80L) // members conserved
      assert(manifest.map(_.getLong(2)).sum == 40L) // samples conserved
      // seekable inventory + fetch: every payload identical to the input
      val inv = ZipShards.inventory(spark, dir + "/*.npz")
      val wantMethod = if (method == "deflated") 8 else 0
      assert(inv.collect().forall(_.getInt(2) == wantMethod))
      val fetched = ZipShards.fetchStored(inv)
        .select("member_name", "payload").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(fetched.keySet == rows.map(_._2).toSet)
      for ((_, name, p) <- rows)
        assert(java.util.Arrays.equals(fetched(name), p), s"$method $name diverges")
      // the blob walk agrees (java.util.zip-independent reader path)
      val viaBlob = spark.read.format("binaryFile").load(dir + "/*.npz")
        .select(org.apache.spark.sql.functions.explode(
          graft.functions.ZipEntriesExpr(col("content"))).as("e"))
        .select(col("e.name")).as[String].collect().toSet
      assert(viaBlob == rows.map(_._2).toSet)
      // and java.util.zip itself reads a bundle (format conformance)
      val one = disk.filter(_.getName.endsWith(".npz")).head
      val zf = new java.util.zip.ZipFile(one)
      try {
        val es = zf.entries()
        while (es.hasMoreElements) {
          val e = es.nextElement()
          val got = new java.io.ByteArrayInputStream(
            zf.getInputStream(e).readAllBytes())
          val want = rows.find(_._2 == e.getName).get._3
          assert(java.util.Arrays.equals(got.readAllBytes(), want))
        }
      } finally zf.close()
      // sample integrity: both members of a key share one bundle
      val perKey = ZipShards.fetchStored(inv).collect()
        .groupBy(_.getString(1).take(4))
        .view.mapValues(_.map(_.getString(0)).distinct.length)
      assert(perKey.values.forall(_ == 1), "a sample split across bundles")
    }
    // ghost-data guard + duplicate refusal (the writeShards discipline)
    val dirty = Files.createTempDirectory("graft_zipw_dirty").toString + "/lake"
    ZipShards.writeBundles(df, dirty, bundlePartitions = 2).collect()
    val eDirty = intercept[IllegalArgumentException](
      ZipShards.writeBundles(df.limit(2), dirty, bundlePartitions = 2).collect())
    assert(eDirty.getMessage.contains("already holds"))
    ZipShards.writeBundles(df, dirty, bundlePartitions = 2,
      overwrite = true).collect() // same data re-exports cleanly
    val dup = Seq(("k", "m.npy", Array[Byte](1)), ("k", "m.npy", Array[Byte](2)))
      .toDF("sample_key", "member_name", "payload")
    val eDup = intercept[org.apache.spark.SparkException](
      ZipShards.writeBundles(dup, dirty + "2").collect())
    assert(eDup.getMessage.contains("duplicate member") ||
      eDup.getCause != null && eDup.getCause.getMessage.contains("duplicate member"))
  }
}
