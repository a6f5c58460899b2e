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
    // a row claiming method 8 refuses instead of reading garbage
    val lied = inv.withColumn("method", org.apache.spark.sql.functions.lit(8))
    val e = intercept[org.apache.spark.SparkException](
      ZipShards.fetchStored(lied).collect())
    assert(e.getMessage.contains("STORED") ||
      e.getCause != null && e.getCause.getMessage.contains("STORED"))
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
}
