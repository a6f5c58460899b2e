package graft.write

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.sources.TokenPruner
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In, IsNull, StringStartsWith}

/** `WriteConf.partitionBy` — Hive-style directory partitioning layered under
 *  the token-sorted layout: dir keys are `graft_p_<col>` TWINS of real data
 *  columns, the data column stays in every file, and the scan prunes whole
 *  directories from pushed filters before any footer/manifest consultation. */
class DirPartitionedSpec extends SparkSpec {

  private val schema = CqlSchema("evt", Seq("id"))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_dirpart_").toString + "/evt"
    import spark.implicits._
    val df = (1L to 4000L)
      .map(i => (i, Seq("click", "view", "purchase", "scroll")((i % 4).toInt), i * 10))
      .toDF("id", "etype", "v")
    TokenSortedWriter.write(df, schema, d, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 4, keepTokenColumn = true,
        partitionBy = Seq("etype")))
    d
  }

  private def graftRead = spark.read.format("graft")
    .option("path", dir).option("pk", "id").option("table", "evt").load()

  test("round-trip: data column present, dir twin hidden, all rows back") {
    val df = graftRead
    assert(df.columns.toSeq == Seq("id", "etype", "v"), "graft_p_* must not leak into the schema")
    assert(df.count() == 4000)
    // the data column really is in the files (not reconstructed from dirs)
    assert(df.filter(col("id") === 42L).select("etype").head().getString(0) == "purchase")
  }

  test("files land under graft_p_etype=<value> dirs, token-disjoint per dir") {
    val files = TokenPruner.listFiles(spark, dir)
    val byDir = files.groupBy(f => TokenPruner.dirValues(f.path)("etype").get)
    assert(byDir.keySet == Set("click", "view", "purchase", "scroll"))
    // within each directory the files keep the pairwise-disjoint invariant
    byDir.values.foreach { fs =>
      val ranges = fs.flatMap(_.tokenRange).sortBy(_._1)
      assert(ranges.length == fs.length, "every file carries token stats")
      ranges.zip(ranges.tail).foreach { case ((_, pmax), (nmin, _)) =>
        assert(pmax < nmin, "per-dir files must not overlap in token space")
      }
    }
  }

  test("pushed equality on the partition column prunes whole directories") {
    val all = TokenPruner.listFiles(spark, dir)
    val pruned = TokenPruner.prune(spark, all, Array(EqualTo("etype", "click")), schema)
    assert(pruned.nonEmpty && pruned.length < all.length)
    assert(pruned.forall(f => TokenPruner.dirValues(f.path)("etype").contains("click")))
    // IN keeps exactly the named dirs
    val in2 = TokenPruner.prune(spark, all,
      Array(In("etype", Array[Any]("click", "view"))), schema)
    assert(in2.forall(f =>
      Set("click", "view")(TokenPruner.dirValues(f.path)("etype").get)))
    assert(in2.length > pruned.length && in2.length < all.length)
  }

  test("dir pruning composes with token pruning; results stay correct") {
    val q = graftRead.filter(col("etype") === "purchase" && col("id") <= 100L)
    assert(q.count() == 25)
    assert(q.agg(sum(col("v"))).head().getLong(0) ==
      (1L to 100L).filter(_ % 4 == 2).map(_ * 10).sum)
  }

  test("range and null filters prune conservatively and correctly") {
    val all = TokenPruner.listFiles(spark, dir)
    // lexicographic: 'scroll' and 'view' are >= 'scroll'
    val ge = TokenPruner.prune(spark, all, Array(GreaterThanOrEqual("etype", "scroll")), schema)
    assert(ge.forall(f => Set("scroll", "view")(TokenPruner.dirValues(f.path)("etype").get)))
    // no null dir exists: IsNull prunes everything
    assert(TokenPruner.prune(spark, all, Array(IsNull("etype")), schema).isEmpty)
    // stats pruning on a NON-partition integral column is sound AND effective:
    // only files whose recorded v-[min,max] can contain 10 survive, and the
    // matching row is still found through the pruned scan
    val statsPruned = TokenPruner.prune(spark, all, Array(EqualTo("v", 10L)), schema)
    assert(statsPruned.nonEmpty && statsPruned.length < all.length,
      "any-integral-column stats should drop files whose range excludes 10")
    val hit = graftRead.filter(col("v") === 10L).collect()
    assert(hit.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "view", 10L)))
    // a predicate the stats genuinely can't evaluate keeps every file:
    // a string comparison value against an integral-stats column
    assert(TokenPruner.prune(spark, all, Array(EqualTo("v", "10")), schema).length == all.length)
    // prefix filters prune through string footer stats ([p, next-prefix)
    // interval vs per-file string [min,max]): 'scr' keeps only the scroll
    // files, a no-match prefix drops everything, and results stay correct
    val pre = TokenPruner.prune(spark, all,
      Array(StringStartsWith("etype", "scr")), schema)
    assert(pre.nonEmpty &&
      pre.forall(f => TokenPruner.dirValues(f.path)("etype").contains("scroll")))
    assert(TokenPruner.prune(spark, all,
      Array(StringStartsWith("etype", "zz")), schema).isEmpty)
    assert(graftRead.filter(col("etype").startsWith("scr")).count() ==
      graftRead.filter(col("etype") === "scroll").count())
  }

  test("multi-column dir partitioning: nested dirs, compound pruning, stats aggregates") {
    val d = Files.createTempDirectory("graft_dir2_").toString + "/t"
    import spark.implicits._
    val df = (1L to 2000L)
      .map(i => (i, Seq("x", "y")((i % 2).toInt), Seq("a", "b", "c")((i % 3).toInt), i * 3))
      .toDF("id", "p1", "p2", "v")
    TokenSortedWriter.write(df, CqlSchema("t", Seq("id")), d, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true,
        partitionBy = Seq("p1", "p2")))
    val all = TokenPruner.listFiles(spark, d)
    // both dir levels parsed
    assert(all.forall { f =>
      val dv = TokenPruner.dirValues(f.path)
      dv.contains("p1") && dv.contains("p2")
    })
    // compound pruning: p1='x' AND p2='b' keeps exactly that subtree
    val pruned = TokenPruner.prune(spark, all,
      Array(EqualTo("p1", "x"), EqualTo("p2", "b")), CqlSchema("t", Seq("id")))
    assert(pruned.nonEmpty && pruned.length < all.length)
    assert(pruned.forall { f =>
      val dv = TokenPruner.dirValues(f.path)
      dv("p1").contains("x") && dv("p2").contains("b")
    })
    val back = spark.read.format("graft").option("path", d).option("pk", "id").load()
    val q = back.filter(col("p1") === "x" && col("p2") === "b")
    assert(q.count() == df.filter(col("p1") === "x" && col("p2") === "b").count())
    // metadata-only aggregates still work over the nested layout
    val mm = back.agg(min(col("id")), max(col("v")), count(lit(1)))
    assert(mm.queryExecution.executedPlan.toString.contains("GraftStatsScan"))
    assert(mm.head() == org.apache.spark.sql.Row(1L, 6000L, 2000L))
  }

  test("upsert + compact preserve the dir layout and its pruning") {
    val src = Files.createTempDirectory("graft_dircmp_").toString + "/t"
    val dst = Files.createTempDirectory("graft_dircmp2_").toString + "/t"
    import spark.implicits._
    val sk = CqlSchema("t", Seq("id"))
    val conf = TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true,
      partitionBy = Seq("cat"))
    val base = (1L to 1000L).map(i => (i, Seq("x", "y")((i % 2).toInt), i)).toDF("id", "cat", "v")
    TokenSortedWriter.write(base, sk, src, SaveMode.Append,
      conf.copy(writetimeMicros = Some(1000L)))
    // second generation bumps v for every 10th id (overlapping token ranges)
    TokenSortedWriter.write(
      base.filter(col("id") % 10 === 0).withColumn("v", col("v") + 100L),
      sk, src, SaveMode.Append, conf.copy(writetimeMicros = Some(2000L)))
    val normalized = TokenSortedWriter.readNormalized(spark, sk, src)
    assert(normalized.count() == 1000L)
    assert(normalized.filter(col("id") === 10L).select("v").head().getLong(0) == 110L)
    assert(normalized.filter(col("id") === 11L).select("v").head().getLong(0) == 11L)
    // compact into a fresh dir-partitioned generation
    TokenSortedWriter.compact(spark, sk, src, dst, conf)
    val files = TokenPruner.listFiles(spark, dst)
    assert(files.forall(f => TokenPruner.dirValues(f.path).contains("cat")),
      "compaction must re-emit the directory layout")
    val back = spark.read.format("graft").option("path", dst).option("pk", "id").load()
    assert(back.count() == 1000L)
    assert(back.filter(col("id") === 10L).select("v").head().getLong(0) == 110L)
    // dir pruning still applies post-compaction
    val pruned = TokenPruner.prune(spark, files, Array(EqualTo("cat", "x")), sk)
    assert(pruned.nonEmpty && pruned.length < files.length)
  }

  test("null partition values round-trip through the Hive default dir") {
    val d = Files.createTempDirectory("graft_dirnull_").toString + "/t"
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, null), (3L, "b"), (4L, null)).toDF("id", "tag")
    TokenSortedWriter.write(df, CqlSchema("t", Seq("id")), d, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true,
        partitionBy = Seq("tag")))
    val back = spark.read.format("graft").option("path", d).option("pk", "id").load()
    assert(back.count() == 4)
    assert(back.filter(col("tag").isNull).count() == 2)
    val all = TokenPruner.listFiles(spark, d)
    val nullDirs = TokenPruner.prune(spark, all, Array(IsNull("tag")), CqlSchema("t", Seq("id")))
    assert(nullDirs.nonEmpty && nullDirs.forall(f => TokenPruner.dirValues(f.path)("tag").isEmpty))
  }
}
