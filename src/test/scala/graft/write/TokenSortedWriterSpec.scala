package graft.write

import graft.SparkSpec
import graft.model.CqlSchema
import graft.token.Murmur3Token
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

class TokenSortedWriterSpec extends SparkSpec {
  import spark.implicits._

  private val schema = CqlSchema("t", Seq("pk"), Seq("ck"))

  private def sample = {
    val rnd = new scala.util.Random(7)
    Seq.fill(2000)((rnd.nextLong(), rnd.nextInt(10), rnd.nextDouble())).toDF("pk", "ck", "v")
  }

  test("tokenSorted output is monotonically non-decreasing in token per partition " +
    "(SortedSSTableWriter.addRow invariant)") {
    val sorted = TokenSortedWriter.tokenSorted(sample, schema,
      TokenSortedWriter.WriteConf(numPartitions = 5))
    val violations = sorted.select(col(TokenSortedWriter.TokenCol).as[Long])
      .mapPartitions { it =>
        var prev = Long.MinValue
        var bad = 0
        it.foreach { t => if (t < prev) bad += 1; prev = t }
        Iterator.single(bad)
      }.collect().sum
    assert(violations === 0)
  }

  test("token column matches the scalar Murmur3 port row-by-row") {
    val sorted = TokenSortedWriter.tokenSorted(sample, schema)
    val rows = sorted.select(col("pk"), col(TokenSortedWriter.TokenCol)).as[(Long, Long)].collect()
    rows.foreach { case (pk, tok) =>
      assert(tok === Murmur3Token.tokenOf(Seq(Long.box(pk))))
    }
  }

  test("partitions are disjoint, complete token ranges (TokenPartitioner invariant)") {
    val sorted = TokenSortedWriter.tokenSorted(sample, schema,
      TokenSortedWriter.WriteConf(numPartitions = 8))
    val ranges = sorted.select(col(TokenSortedWriter.TokenCol).as[Long])
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else { val s = it.toSeq; Iterator.single((s.min, s.max)) }
      }.collect().sortBy(_._1)
    // complete coverage of the data + no overlap between consecutive ranges
    ranges.sliding(2).foreach {
      case Array((_, max1), (min2, _)) => assert(max1 <= min2, "overlapping partition ranges")
      case _ =>
    }
  }

  test("random-ring write: binary md5 tokens, per-partition sorted, round-trip exact") {
    val conf = TokenSortedWriter.WriteConf(numPartitions = 4, partitioner = "random",
      keepTokenColumn = true)
    val sorted = TokenSortedWriter.tokenSorted(sample, schema, conf)
    // token matches the scalar RandomToken port row-by-row
    sorted.select(col("pk"), col(TokenSortedWriter.TokenCol)).as[(Long, Array[Byte])]
      .collect().foreach { case (pk, tok) =>
        assert(java.util.Arrays.equals(tok,
          graft.token.RandomToken.tokenBytes16(
            graft.token.RandomToken.tokenOf(Seq(Long.box(pk))))), s"pk=$pk")
      }
    // per-partition monotone in unsigned byte order (the sorted-run invariant)
    val violations = sorted.select(col(TokenSortedWriter.TokenCol).as[Array[Byte]])
      .mapPartitions { it =>
        var prev: Array[Byte] = null
        var bad = 0
        it.foreach { t =>
          if (prev != null && java.util.Arrays.compareUnsigned(prev, t) > 0) bad += 1
          prev = t
        }
        Iterator.single(bad)
      }.collect().sum
    assert(violations === 0)
    // full write/read round-trip preserves data
    val out = java.nio.file.Files.createTempDirectory("graft_rring_spec_").toString + "/t"
    TokenSortedWriter.write(sample, schema, out, SaveMode.Append, conf)
    val back = TokenSortedWriter.read(spark, schema, out)
    assert(back.count() === 2000)
    assert(back.select("pk", "ck", "v").except(sample).isEmpty)
    // ringSplits needs the long murmur3 ring
    intercept[IllegalArgumentException] {
      TokenSortedWriter.tokenSorted(sample, schema,
        conf.copy(ringSplits = 4))
    }
    intercept[IllegalArgumentException] {
      TokenSortedWriter.tokenSorted(sample, schema, conf.copy(partitioner = "nope"))
    }
  }

  test("write rejects SaveMode.Overwrite unless opted in (reference sink semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ow_").toString
    intercept[IllegalArgumentException] {
      TokenSortedWriter.write(sample, schema, dir + "/t", SaveMode.Overwrite)
    }
    TokenSortedWriter.write(sample, schema, dir + "/t", SaveMode.Overwrite,
      TokenSortedWriter.WriteConf(allowOverwrite = true)) // opt-in path works
  }

  test("round-trip write → read preserves data exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rt_").toString + "/t"
    val df = sample
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 4))
    val back = TokenSortedWriter.read(spark, schema, dir)
    assert(back.as[(Long, Int, Double)].collect().toSet ===
      df.as[(Long, Int, Double)].collect().toSet)
    // role metadata survives the round trip
    val roles = CqlSchema.fromStruct("t", back.schema)
    assert(roles.partitionKeys === Seq("pk") && roles.clusteringKeys === Seq("ck"))
  }

  test("maxRecordsPerFile rolls output files (size-capped SSTable analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_roll_").toString + "/t"
    TokenSortedWriter.write(sample, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, maxRecordsPerFile = 300L))
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 7, s"expected >= ceil(2000/300) files, got $files")
  }

  test("bloomFilterColumns writes per-column parquet bloom filters the reader probes " +
    "(per-SSTable bloom analog for non-token point lookups)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_").toString + "/t"
    // v is high-cardinality and UNCORRELATED with the token sort order —
    // min/max stats cannot prune it; only a bloom filter can
    val df = (0L until 4000L).map(i => (i, 0, s"u-${i * 2654435761L}"))
      .toDF("pk", "ck", "v")
    TokenSortedWriter.write(df, schema, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2,
        bloomFilterColumns = Seq("v"), bloomFilterNdv = 4000L))
    // 1. the written footers carry a bloom filter for v (and none for ck)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parquetFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(parquetFiles.nonEmpty)
    parquetFiles.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(f.getPath, spark.sparkContext.hadoopConfiguration)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val rg = reader.getFooter.getBlocks.get(0)
        val byPath = rg.getColumns.asScala.map(c =>
          c.getPath.toDotString -> c).toMap
        assert(reader.getBloomFilterDataReader(rg)
          .readBloomFilter(byPath("v")) != null,
          s"no bloom filter for v in ${f.getPath.getName}")
        assert(reader.getBloomFilterDataReader(rg)
          .readBloomFilter(byPath("ck")) == null,
          "bloom filters must be opt-in per column")
      } finally reader.close()
    }
    // 2. a point filter on v is pushed to the scan (the probe's trigger)
    val back = TokenSortedWriter.read(spark, schema, dir).filter(col("v") === "u-2654435761")
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("v"),
      s"point filter on v not pushed:\n$scan")
    assert(back.count() === 1L)
    // 3. and a miss probe returns empty without error
    assert(TokenSortedWriter.read(spark, schema, dir)
      .filter(col("v") === "not-there").count() === 0L)
  }
}
