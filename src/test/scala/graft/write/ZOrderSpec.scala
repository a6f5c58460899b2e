package graft.write

import graft.SparkSpec
import graft.model.CqlSchema
import graft.sources.TokenPruner
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{And, GreaterThanOrEqual, LessThanOrEqual}

/** Z-order layout: files must carry NARROW footer ranges on every listed
 *  dimension, so the existing stats pruning skips files for filters on ANY
 *  single column — the property a token/single-column sort cannot give. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val schema = CqlSchema("zt", Seq("a"))

  // two independent uniform dimensions; a 1-D sort on either would leave
  // the OTHER column's per-file range at full width
  private def grid = {
    val rnd = new scala.util.Random(3)
    Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong,
      rnd.nextDouble())).toDF("a", "b", "v")
  }

  private def bandFilter(c: String, lo: Long, hi: Long) =
    And(GreaterThanOrEqual(c, lo), LessThanOrEqual(c, hi))

  test("zorder write prunes files on BOTH dimensions; token sort only on one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zo_").toString + "/zt"
    val df = grid
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 16, zorderBy = Seq("a", "b")))
    val files = TokenPruner.listFiles(spark, dir)
    assert(files.length === 16)
    assert(files.forall(_.tokenRange.isEmpty), "zorder layout has no token stats")
    // an eighth-width band on EITHER dimension plans well under half the files
    val prunedA = TokenPruner.prune(spark, files,
      Array(bandFilter("a", 0L, 127L)), schema)
    val prunedB = TokenPruner.prune(spark, files,
      Array(bandFilter("b", 0L, 127L)), schema)
    assert(prunedA.length <= files.length / 2,
      s"a-band kept ${prunedA.length}/${files.length}")
    assert(prunedB.length <= files.length / 2,
      s"b-band kept ${prunedB.length}/${files.length}")
    // a 2-D cell prunes harder than either band alone
    val prunedAB = TokenPruner.prune(spark, files,
      Array(bandFilter("a", 0L, 127L), bandFilter("b", 0L, 127L)), schema)
    assert(prunedAB.length <= math.min(prunedA.length, prunedB.length))
    // correctness end-to-end: pruned reads return exactly the band
    val back = TokenSortedWriter.read(spark, schema, dir)
    assert(back.filter(col("a") <= 127L).count() ===
      df.filter(col("a") <= 127L).count())
    assert(back.filter(col("b") <= 127L).count() ===
      df.filter(col("b") <= 127L).count())
    assert(back.count() === 20000L)
    // contrast: the token-sorted layout scatters BOTH dims across all files
    val tdir = java.nio.file.Files.createTempDirectory("graft_zo_t_").toString + "/zt"
    TokenSortedWriter.write(df, schema, tdir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 16))
    val tfiles = TokenPruner.listFiles(spark, tdir)
    val tPrunedB = TokenPruner.prune(spark, tfiles,
      Array(bandFilter("b", 0L, 127L)), schema)
    assert(tPrunedB.length === tfiles.length,
      "token sort cannot prune on a non-key dimension")
  }

  test("zorder rejects non-integral columns and conflicting layouts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zo_bad_").toString
    intercept[IllegalArgumentException] {
      TokenSortedWriter.write(grid, schema, s"$dir/t1", SaveMode.Append,
        TokenSortedWriter.WriteConf(zorderBy = Seq("a", "v")))
    }
    intercept[IllegalArgumentException] {
      TokenSortedWriter.write(grid, schema, s"$dir/t2", SaveMode.Append,
        TokenSortedWriter.WriteConf(zorderBy = Seq("a", "b"), ringSplits = 4))
    }
    intercept[IllegalArgumentException] {
      TokenSortedWriter.write(grid, schema, s"$dir/t3", SaveMode.Append,
        TokenSortedWriter.WriteConf(zorderBy = Seq("a")))
    }
  }

  test("zorder on (string, long): both axes prune; prefix filter prunes too") {
    import org.apache.spark.sql.sources.{EqualTo, StringStartsWith}
    val rnd = new scala.util.Random(7)
    // realistic string dim: shared URL-ish prefix the rank normalization
    // must strip, then a spreading suffix
    val df = Seq.fill(20000)((rnd.nextLong(),
        f"https://host/${rnd.nextInt(1024)}%04d/page", rnd.nextInt(1024).toLong))
      .toDF("a", "s", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_zo_s_").toString + "/zt"
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 16, zorderBy = Seq("s", "b")))
    val files = TokenPruner.listFiles(spark, dir)
    assert(files.length === 16)
    assert(files.forall(_.strRanges.contains("s")), "string stats missing")
    // an eighth-width band on EITHER axis plans well under half the files
    val sBand = And(GreaterThanOrEqual("s", "https://host/0000/page"),
      LessThanOrEqual("s", "https://host/0127/page"))
    val prunedS = TokenPruner.prune(spark, files, Array(sBand), schema)
    val prunedB = TokenPruner.prune(spark, files,
      Array(bandFilter("b", 0L, 127L)), schema)
    assert(prunedS.length <= files.length / 2,
      s"s-band kept ${prunedS.length}/${files.length}")
    assert(prunedB.length <= files.length / 2,
      s"b-band kept ${prunedB.length}/${files.length}")
    // point lookup and prefix predicates prune at least as hard as the band
    val prunedEq = TokenPruner.prune(spark, files,
      Array(EqualTo("s", "https://host/0063/page")), schema)
    assert(prunedEq.length <= prunedS.length)
    val prunedPre = TokenPruner.prune(spark, files,
      Array(StringStartsWith("s", "https://host/00")), schema)
    assert(prunedPre.length <= files.length / 2,
      s"prefix kept ${prunedPre.length}/${files.length}")
    // correctness end-to-end: pruned reads return exactly the band
    val back = TokenSortedWriter.read(spark, schema, dir)
    assert(back.filter(col("s") <= "https://host/0127/page").count() ===
      df.filter(col("s") <= "https://host/0127/page").count())
    assert(back.filter(col("s").startsWith("https://host/00")).count() ===
      df.filter(col("s").startsWith("https://host/00")).count())
    assert(back.count() === 20000L)
  }

  test("zorder on (timestamp, long): accepts the type, round-trips, clusters time") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(20000)((rnd.nextLong(),
        new java.sql.Timestamp(base + rnd.nextInt(86400) * 1000L),
        rnd.nextInt(1024).toLong))
      .toDF("a", "ts", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_zo_ts_").toString + "/zt"
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 16, zorderBy = Seq("ts", "b")))
    val back = TokenSortedWriter.read(spark, schema, dir)
    assert(back.count() === 20000L)
    val cut = new java.sql.Timestamp(base + 3 * 3600 * 1000L)
    assert(back.filter(col("ts") <= cut).count() === df.filter(col("ts") <= cut).count())
    // time clustering: per-file ts spans must be narrow (Z-locality on the
    // time axis), so parquet row-group stats serve time-band scans
    val spanSec = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / 1000000L).as("span"))
      .agg(avg(col("span"))).head().getDouble(0)
    assert(spanSec < 86400.0 / 2, s"mean per-file ts span ${spanSec}s — no time locality")
  }

  test("zorder interleave: adjacent keys stay adjacent in both dims (locality)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zo_loc_").toString + "/zt"
    TokenSortedWriter.write(grid, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 16, zorderBy = Seq("a", "b"),
        keepTokenColumn = true))
    // per-file (a, b) spans: sum of normalized areas must be far below
    // nFiles (a random split would give ~nFiles × full area)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(((max(col("a")) - min(col("a"))).cast("double") / 1023.0 *
        ((max(col("b")) - min(col("b"))).cast("double") / 1023.0)).as("area"))
      .select(sum(col("area"))).head().getDouble(0)
    assert(spans < 16 * 0.5, s"total normalized area $spans — no 2-D locality")
  }

  test("layout maintenance: unclustered appends degrade pruning, compactInPlace(zorderBy) restores it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zo_m_").toString + "/zt"
    val df = grid
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 8, zorderBy = Seq("a", "b")))
    // daily appends land token-sorted (no zorder): their files span the
    // full (a, b) grid and the band filter cannot skip them
    val inc = df.withColumn("a", col("a") + 2048L) // disjoint ids, same b spread
    TokenSortedWriter.write(inc, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 8))
    val degraded = TokenPruner.prune(spark, TokenPruner.listFiles(spark, dir),
      Array(bandFilter("b", 0L, 127L)), schema)
    assert(degraded.length > 8, // every appended file survives the b-band
      s"expected the appended files to defeat b-pruning, kept ${degraded.length}")
    // one in-place re-cluster restores two-axis pruning over the WHOLE table
    TokenSortedWriter.compactInPlace(spark, schema, dir,
      TokenSortedWriter.WriteConf(numPartitions = 16, zorderBy = Seq("a", "b")))
    val files = TokenPruner.listFiles(spark, dir)
    val restored = TokenPruner.prune(spark, files,
      Array(bandFilter("b", 0L, 127L)), schema)
    assert(restored.length <= files.length / 2,
      s"b-band kept ${restored.length}/${files.length} after re-cluster")
    // and no rows were lost or duplicated by the maintenance pass (the
    // graft source lists the gen-* layout; a flat parquet read cannot)
    assert(spark.read.format("graft").option("path", dir).option("pk", "a")
      .load().count() === 40000L)
  }
}
