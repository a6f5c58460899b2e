package graft.functions

import graft.SparkSpec

/** tar/zip/gzip shard-archive surface: header walks, stored-member
 *  slicing, bounded inflate, composition, and the null contracts. */
class ArchiveSpec extends SparkSpec {

  private val data1 = Array.tabulate[Byte](700)(i => (i % 251).toByte)
  private val data2 = "hello shard".getBytes

  test("tar: names, sizes, offsets, 512 alignment, dirs and prefix") {
    val t = ArchiveCodec.tar(Seq(
      ("000001.jpg", data1), ("000001.txt", data2), ("000002.jpg", data2)))
    val es = TarHeaders.entries(t)
    assert(es.map(_.name).toSeq == Seq("000001.jpg", "000001.txt", "000002.jpg"))
    assert(es.map(_.size).toSeq == Seq(700L, 11L, 11L))
    // member 1 data at 512; member 2 header at 512+1024(=700 padded)
    assert(es.map(_.offset).toSeq == Seq(512L, 2048L, 3072L))
    assert(es.forall(_.typ == "file"))
    // the payload at the reported offset really is the member
    val e2 = es(1)
    assert(new String(t, e2.offset.toInt, e2.size.toInt) == "hello shard")
  }

  test("tar: JDK-written archives parse identically (cross-validation)") {
    // JDK has no tar writer; cross-validate by parsing our writer's output
    // against the independent arithmetic of the spec instead: checksum
    // recomputation and end-block detection
    val t = ArchiveCodec.tar(Seq(("a.bin", data2)))
    // verify the checksum field we wrote matches the spec's definition
    var sum = 0
    val h = t.take(512).clone()
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    h.foreach(b => sum += b & 0xff)
    val written = Integer.parseInt(
      new String(t, 148, 6, java.nio.charset.StandardCharsets.US_ASCII), 8)
    assert(written == sum)
    assert(TarHeaders.entries(t).length == 1)
  }

  test("tar checksum gate: octal-looking non-tar blobs are null") {
    // a blob whose size field parses as octal but whose checksum is wrong
    // must NOT produce phantom entries
    val fake = new Array[Byte](1024)
    fake(0) = 'x'
    fake(124) = '4'; fake(125) = '2'; fake(126) = 0
    assert(TarHeaders.entries(fake) == null)
    // flipping any checksum digit of a real tar kills the listing
    val good = ArchiveCodec.tar(Seq(("a.bin", data2)))
    val bad = good.clone()
    bad(148) = (bad(148) ^ 1).toByte
    assert(TarHeaders.entries(bad) == null)
  }

  test("tar: PAX 'x' path override and old-GNU magic (atime is not a prefix)") {
    val pax = ArchiveCodec.tarTyped(Seq(
      ("././@PaxHeader", ArchiveCodec.paxPayload("very/long/die/echte.bin"), 'x'),
      ("truncated.bin", data2, '0'),
      ("plain.bin", data2, '0')))
    val es = TarHeaders.entries(pax)
    assert(es.map(_.name).toSeq == Seq("very/long/die/echte.bin", "plain.bin"))
    assert(es.forall(_.typ == "file"))
    // old-GNU magic: offset 345 holds an atime, which must NOT be read as
    // a POSIX prefix and glued onto the name
    val gnu = ArchiveCodec.tarTyped(Seq(("old.bin", data2, '0')),
      gnuMagic = true, gnuAtime = 0x1234567L)
    assert(TarHeaders.entries(gnu).map(_.name).toSeq == Seq("old.bin"))
  }

  test("tar: PAX record length is a BYTE count — non-ASCII paths round-trip") {
    // 40 two-byte (UTF-8) chars + ASCII tail: > 100 bytes, and bytes !=
    // chars, so a char-counted record length would land mid-record
    val name = "crawl/" + ("é" * 40) + "/päge-δοκιμή.txt"
    val payload = ArchiveCodec.paxPayload(name)
    // the decimal prefix must equal the record's BYTE length exactly
    val sp = payload.indexOf(' '.toByte)
    val declared = new String(payload, 0, sp, "US-ASCII").toInt
    assert(declared == payload.length)
    assert(payload.last == '\n'.toByte)
    val pax = ArchiveCodec.tarTyped(Seq(
      ("././@PaxHeader", payload, 'x'),
      ("short.bin", data2, '0')))
    assert(TarHeaders.entries(pax).map(_.name).toSeq == Seq(name))
  }

  test("tar_member slices payloads; composes with npy_meta for WebDataset members") {
    val npy = NpyCodec.encode("<f4", fortran = false, Seq(5L), 20)
    val shard = ArchiveCodec.tar(Seq(("000001.npy", npy), ("000001.txt", data2)))
    assert(java.util.Arrays.equals(TarHeaders.member(shard, "000001.npy"), npy))
    assert(NpyHeaders.parse(TarHeaders.member(shard, "000001.npy")).nElems == 5)
    assert(TarHeaders.member(shard, "absent.npy") == null)
    assert(TarHeaders.member("not tar".getBytes ++ new Array[Byte](600), "x") == null)
  }

  test("tar corrupt/truncated bytes: null or partial listing, never throws") {
    assert(TarHeaders.entries("plain text, definitely not a tar header".getBytes ++
      new Array[Byte](512)) == null)
    assert(TarHeaders.entries(null) == null)
    val good = ArchiveCodec.tar(Seq(("x.bin", data1), ("y.bin", data2)))
    for (cut <- 0 until good.length by 7) TarHeaders.entriesArray(good.take(cut))
    val rnd = new scala.util.Random(21)
    for (_ <- 0 until 200) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      TarHeaders.entriesArray(b)
    }
  }

  test("zip: central directory listing + stored member slice feeds npy_meta") {
    val npy = NpyCodec.encode("<f8", fortran = false, Seq(6L), 48)
    val z = ArchiveCodec.zipStored(Seq(("arr_0.npy", npy), ("meta.txt", data2)))
    val es = ZipHeaders.entries(z)
    assert(es.map(e => (e.name, e.method, e.size)).toSeq ==
      Seq(("arr_0.npy", 0, npy.length.toLong), ("meta.txt", 0, 11L)))
    val member = ZipHeaders.storedMember(z, "arr_0.npy")
    assert(java.util.Arrays.equals(member, npy))
    val m = NpyHeaders.parse(member)
    assert(m.descr == "<f8" && m.nElems == 6)
    assert(ZipHeaders.storedMember(z, "absent.npy") == null)
  }

  test("zip: the JDK's own ZipOutputStream (stored) parses identically") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val e = new java.util.zip.ZipEntry("jdk.bin")
    e.setMethod(java.util.zip.ZipEntry.STORED)
    e.setSize(data2.length)
    val crc = new java.util.zip.CRC32; crc.update(data2)
    e.setCrc(crc.getValue)
    zos.putNextEntry(e); zos.write(data2); zos.closeEntry(); zos.close()
    val z = bos.toByteArray
    val es = ZipHeaders.entries(z)
    assert(es.map(_.name).toSeq == Seq("jdk.bin"))
    assert(java.util.Arrays.equals(ZipHeaders.storedMember(z, "jdk.bin"), data2))
  }

  test("zip: EOCD validation rejects the pattern inside comments and random tails") {
    // PK\x05\x06 inside the archive COMMENT must not hijack the scan
    val withComment = ArchiveCodec.zipStored(Seq(("a.bin", data2)),
      comment = "note PK in a comment".getBytes("ISO-8859-1"))
    val es = ZipHeaders.entries(withComment)
    assert(es != null && es.map(_.name).toSeq == Seq("a.bin"))
    assert(java.util.Arrays.equals(
      ZipHeaders.storedMember(withComment, "a.bin"), data2))
    // the bare pattern in a non-zip blob: inconsistent candidate -> null
    val fake = new Array[Byte](4096)
    fake(100) = 'P'; fake(101) = 'K'; fake(102) = 5; fake(103) = 6
    assert(ZipHeaders.entries(fake) == null)
  }

  test("zip64: sentinel EOCD routes through the locator; member offsets via extra") {
    val npy = NpyCodec.encode("<f4", fortran = false, Seq(4L), 16)
    val z = ArchiveCodec.zipStored(Seq(("arr_0.npy", npy), ("b.bin", data2)),
      zip64 = true)
    val es = ZipHeaders.entries(z)
    assert(es != null && es.map(_.name).toSeq == Seq("arr_0.npy", "b.bin"))
    assert(java.util.Arrays.equals(ZipHeaders.storedMember(z, "arr_0.npy"), npy))
    assert(NpyHeaders.parse(ZipHeaders.storedMember(z, "arr_0.npy")).nElems == 4)
    // a sentinel EOCD with NO zip64 record behind it is a lying header
    val classic = ArchiveCodec.zipStored(Seq(("a", data2)))
    val lying = classic.clone()
    // overwrite the count field with the 0xFFFF sentinel
    val eocdAt = classic.length - 22
    lying(eocdAt + 10) = 0xff.toByte; lying(eocdAt + 11) = 0xff.toByte
    assert(ZipHeaders.entries(lying) == null)
  }

  /** Hand-built single-member stored zip whose CENTRAL entry carries a
   *  chosen uncompressed-size sentinel + zip64 extra — for forging the
   *  hostile shapes the fixture encoder refuses to write. */
  private def zipWithForgedExtra(
      data: Array[Byte], extra: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    val nb = "a".getBytes
    val crc = new java.util.zip.CRC32; crc.update(data)
    out.write('P'); out.write('K'); out.write(3); out.write(4)
    le16(20); le16(0); le16(0); le16(0); le16(0)
    le32(crc.getValue); le32(data.length); le32(data.length)
    le16(nb.length); le16(0)
    out.write(nb); out.write(data)
    val cdStart = out.size()
    out.write('P'); out.write('K'); out.write(1); out.write(2)
    le16(20); le16(45); le16(0); le16(0); le16(0); le16(0)
    le32(crc.getValue); le32(data.length)
    le32(0xffffffffL) // uncompressed size: zip64 sentinel
    le16(nb.length); le16(extra.length); le16(0)
    le16(0); le16(0); le32(0)
    le32(0) // local offset (real)
    out.write(nb); out.write(extra)
    val cdSize = out.size() - cdStart
    out.write('P'); out.write('K'); out.write(5); out.write(6)
    le16(0); le16(0); le16(1); le16(1)
    le32(cdSize); le32(cdStart); le16(0)
    out.toByteArray
  }

  test("zip64 forged extras: negative size and lying extra length are null, not throws") {
    def le64(v: Long): Array[Byte] =
      Array.tabulate[Byte](8)(k => ((v >>> (8 * k)) & 0xff).toByte)
    // bit 63 set: leU64 resolves the size to a NEGATIVE long — both the
    // downstream bounds guards pass for negatives and copyOfRange would
    // throw IllegalArgumentException; the contract is null
    val negSize = zipWithForgedExtra(data2,
      Array[Byte](1, 0, 8, 0) ++ le64(0x8000000000000001L))
    assert(ZipHeaders.entries(negSize).isEmpty) // lying entry ends the walk
    assert(ZipHeaders.memberOrNull(negSize,
      org.apache.spark.unsafe.types.UTF8String.fromString("a")) == null)
    // extra declares len 200 inside a 12-byte extra region: trusting it
    // would read the "zip64 size" out of whatever follows the entry
    val lyingLen = zipWithForgedExtra(data2,
      Array[Byte](1, 0, 200.toByte, 0) ++ le64(data2.length.toLong))
    assert(ZipHeaders.entries(lyingLen).isEmpty)
    assert(ZipHeaders.memberOrNull(lyingLen,
      org.apache.spark.unsafe.types.UTF8String.fromString("a")) == null)
    // control: the same shape with an honest (1, 8, size) extra parses
    val honest = zipWithForgedExtra(data2,
      Array[Byte](1, 0, 8, 0) ++ le64(data2.length.toLong))
    val es = ZipHeaders.entries(honest)
    assert(es != null && es.head.size == data2.length.toLong)
    assert(java.util.Arrays.equals(
      ZipHeaders.storedMember(honest, "a"), data2))
  }

  test("zip corrupt bytes: null, never exceptions") {
    assert(ZipHeaders.entries("no zip here at all, definitely not".getBytes) == null)
    assert(ZipHeaders.entries(null) == null)
    val good = ArchiveCodec.zipStored(Seq(("a", data2)))
    for (cut <- 0 until good.length) {
      ZipHeaders.entriesArray(good.take(cut))
      ZipHeaders.memberOrNull(good.take(cut),
        org.apache.spark.unsafe.types.UTF8String.fromString("a"))
    }
    val rnd = new scala.util.Random(22)
    for (_ <- 0 until 200) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      ZipHeaders.entriesArray(b)
      ZipHeaders.memberOrNull(b,
        org.apache.spark.unsafe.types.UTF8String.fromString("a"))
    }
  }

  test("zunstd: round trip, tar.zst composition, bomb cap, corrupt-bytes null") {
    val rt = ZstdBytes.zunstd(ArchiveCodec.zstd(data1), 1 << 20)
    assert(java.util.Arrays.equals(rt, data1))
    // concatenated frames decode as one stream
    val two = ArchiveCodec.zstd(data1) ++ ArchiveCodec.zstd(data2)
    assert(java.util.Arrays.equals(
      ZstdBytes.zunstd(two, 1 << 20), data1 ++ data2))
    // a pzstd-style LEADING skippable frame is accepted and skipped
    val skippablePrefixed = ArchiveCodec.zstdSkippable("meta".getBytes) ++
      ArchiveCodec.zstd(data2)
    assert(java.util.Arrays.equals(
      ZstdBytes.zunstd(skippablePrefixed, 1 << 20), data2))
    // .tar.zst composes exactly like the gzip twin
    val shard = ArchiveCodec.tar(Seq(("a.bin", data2), ("b.bin", data1)))
    val es = TarHeaders.entries(ZstdBytes.zunstd(ArchiveCodec.zstd(shard), 1 << 22))
    assert(es.map(_.name).toSeq == Seq("a.bin", "b.bin"))
    // output cap: a highly compressible payload past maxBytes is null
    val bomb = ArchiveCodec.zstd(new Array[Byte](1 << 20))
    assert(ZstdBytes.zunstd(bomb, 1 << 10) == null)
    assert(ZstdBytes.zunstd(bomb, 1 << 21) != null)
    // non-zstd, truncated, and bit-flipped bytes: null, never throws
    assert(ZstdBytes.zunstd("not zstd".getBytes, 1 << 20) == null)
    assert(ZstdBytes.zunstd(null, 1 << 20) == null)
    val good = ArchiveCodec.zstd(data1)
    for (cut <- 4 until good.length) ZstdBytes.zunstd(good.take(cut), 1 << 20)
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 200) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      ZstdBytes.zunstd(b, 1 << 20)
    }
  }

  test("gunzip: round trip, JDK GZIP cross-validation, name flag, bomb cap") {
    val rt = GzipBytes.gunzip(ArchiveCodec.gzip(data1), 1 << 20)
    assert(java.util.Arrays.equals(rt, data1))
    val named = GzipBytes.gunzip(ArchiveCodec.gzip(data1, withName = true), 1 << 20)
    assert(java.util.Arrays.equals(named, data1))
    // JDK-written gzip decodes under our header walk
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data2); g.close()
    assert(java.util.Arrays.equals(GzipBytes.gunzip(bos.toByteArray, 1 << 20), data2))
    // ...and ours under the JDK reader
    val jdk = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(ArchiveCodec.gzip(data2))).readAllBytes()
    assert(java.util.Arrays.equals(jdk, data2))
    // output cap: a 1 MiB expansion against a 1 KiB cap is null, no OOM
    val big = ArchiveCodec.gzip(new Array[Byte](1 << 20))
    assert(GzipBytes.gunzip(big, 1024) == null)
    assert(GzipBytes.gunzip("not gz".getBytes, 1024) == null)
    assert(GzipBytes.gunzip(ArchiveCodec.gzip(data1).take(20), 1 << 20) == null)
  }

  test("webdatasetSamples groups members; tar.gz composes through gunzip") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val shard = ArchiveCodec.tar(Seq(
      ("000001.jpg", data1), ("000001.cls", data2),
      ("000002.jpg", data2), ("dir/000003.wav.json", data2)))
    val df = Seq((1L, shard), (2L, "not a tar".getBytes ++ new Array[Byte](600)))
      .toDF("id", "blob")
    val rows = graft.operators.Multimodal.webdatasetSamples(df, "blob")
      .select("id", "sample_key", "member_ext", "member_size").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // WebDataset base_plus_ext: directories STAY in the key
    assert(rows.toSeq == Seq(
      (1L, "000001", "jpg", 700L), (1L, "000001", "cls", 11L),
      (1L, "000002", "jpg", 11L), (1L, "dir/000003", "wav.json", 11L)))
    // tar.gz: gunzip feeds tar_entries
    val tgz = Seq((1L, ArchiveCodec.gzip(shard))).toDF("id", "blob")
      .select(explode(TarEntriesExpr(GunzipExpr(col("blob"), 1 << 24))).as("e"))
      .select(col("e.name")).as[String].collect()
    assert(tgz.toSeq == Seq("000001.jpg", "000001.cls", "000002.jpg",
      "dir/000003.wav.json"))
  }

  test("zip_member: deflated members inflate exactly (savez_compressed layout)") {
    val npy = NpyCodec.encode("<i8", fortran = false, Seq(4L), 32)
    val big = Array.tabulate[Byte](5000)(i => (i % 5).toByte)
    val z = ArchiveCodec.zipMixed(Seq(
      ("arr_0.npy", npy, 8), ("blob.bin", big, 8), ("doc.txt", data2, 0)))
    // listing reports method 8 with comp_size < size for the deflated pair
    val es = ZipHeaders.entries(z).map(e => e.name -> e).toMap
    assert(es("arr_0.npy").method == 8 && es("blob.bin").method == 8)
    assert(es("blob.bin").compSize < es("blob.bin").size)
    // method-8 members inflate, method-0 still slices, through ONE call
    assert(java.util.Arrays.equals(ZipHeaders.member(z, "arr_0.npy", 1 << 20), npy))
    assert(java.util.Arrays.equals(ZipHeaders.member(z, "blob.bin", 1 << 20), big))
    assert(java.util.Arrays.equals(ZipHeaders.member(z, "doc.txt", 1 << 20), data2))
    assert(ZipHeaders.member(z, "absent.npy", 1 << 20) == null)
    // the old stored-only surface keeps refusing deflated members
    assert(ZipHeaders.storedMember(z, "arr_0.npy") == null)
    // JDK's ZipOutputStream (default DEFLATED) cross-validates
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("jdk.bin"))
    zos.write(big); zos.closeEntry(); zos.close()
    assert(java.util.Arrays.equals(
      ZipHeaders.member(bos.toByteArray, "jdk.bin", 1 << 20), big))
    // ...and the SQL surface composes with npy_meta
    val spark = this.spark
    import spark.implicits._
    val nElems = Seq(Tuple1(z)).toDF("blob").selectExpr(
      "npy_meta(zip_member(blob, 'arr_0.npy', 1048576)).n_elems").as[Long].head()
    assert(nElems == 4)
  }

  test("zip_member hostile bytes: lying sizes, bomb cap, fuzz — null, never throws") {
    val big = Array.tabulate[Byte](5000)(i => (i % 5).toByte)
    val z = ArchiveCodec.zipMixed(Seq(("a.bin", big, 8)))
    // output cap below the declared size: null (bomb guard), not an OOM
    assert(ZipHeaders.member(z, "a.bin", 100) == null)
    // find the CD entry and lie about the declared sizes
    var cd = -1
    for (i <- 0 until z.length - 4 if cd < 0)
      if (z(i) == 'P' && z(i + 1) == 'K' && z(i + 2) == 1 && z(i + 3) == 2)
        cd = i
    def le32At(b: Array[Byte], p: Int, v: Long): Unit =
      for (k <- 0 until 4) b(p + k) = ((v >> (8 * k)) & 0xff).toByte
    // size smaller than the stream inflates to: overflow -> null
    val small = z.clone(); le32At(small, cd + 24, big.length - 1L)
    assert(ZipHeaders.member(small, "a.bin", 1 << 20) == null)
    // size larger than the stream yields: short inflate -> null
    val largeS = z.clone(); le32At(largeS, cd + 24, big.length + 1L)
    assert(ZipHeaders.member(largeS, "a.bin", 1 << 20) == null)
    // comp_size truncating the stream: inflater starves -> null
    val shortC = z.clone(); le32At(shortC, cd + 20, 3L)
    assert(ZipHeaders.member(shortC, "a.bin", 1 << 20) == null)
    // comp_size past the buffer end -> null
    val longC = z.clone(); le32At(longC, cd + 20, z.length.toLong)
    assert(ZipHeaders.member(longC, "a.bin", 1 << 20) == null)
    // truncation + random corruption fuzz: null or a value, never a throw
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("a.bin")
    for (cut <- 0 until z.length by 7)
      ZipHeaders.memberAnyOrNull(z.take(cut), u, 1 << 20)
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 300) {
      val b = z.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      ZipHeaders.memberAnyOrNull(b, u, 1 << 20)
    }
  }
}
