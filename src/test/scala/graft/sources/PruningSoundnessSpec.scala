package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.write.TokenSortedWriter
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/**
 * Differential soundness fuzz: for MANY randomly generated filters, the
 * graft source (token pruning + dir pruning + pushdown + stats) must return
 * exactly the rows a plain parquet read returns under the same predicate.
 * File pruning is only ever allowed to skip files that cannot match — any
 * divergence here is a correctness bug, not a performance choice.
 */
class PruningSoundnessSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)

  private lazy val (plainDir, graftDir, dirPartDir): (String, String, String) = {
    import spark.implicits._
    val df = (1L to 3000L).map { i =>
      (i, Seq("a", "b", "c", "d", "e")((i % 5).toInt),
        if (i % 11 == 0) null else s"v${i % 13}", i % 17)
    }.toDF("id", "cat", "tag", "v")
    val plain = Files.createTempDirectory("graft_fuzz_plain_").toString + "/t"
    df.write.parquet(plain)
    val g = Files.createTempDirectory("graft_fuzz_g_").toString + "/t"
    TokenSortedWriter.write(df, CqlSchema("t", Seq("id")), g, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 5, keepTokenColumn = true))
    val dp = Files.createTempDirectory("graft_fuzz_dp_").toString + "/t"
    TokenSortedWriter.write(df, CqlSchema("t", Seq("id")), dp, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 3, keepTokenColumn = true,
        partitionBy = Seq("cat")))
    (plain, g, dp)
  }

  private def graftRead(dir: String): DataFrame = spark.read.format("graft")
    .option("path", dir).option("pk", "id").load()

  /** One random predicate over (id, cat, tag, v). */
  private def randomFilter(): Column = {
    def one(): Column = rnd.nextInt(8) match {
      case 0 => col("id") === (rnd.nextInt(3500) + 1).toLong
      case 1 => col("id").isin((1 to rnd.nextInt(5) + 1).map(_ => (rnd.nextInt(3500) + 1).toLong): _*)
      case 2 => col("cat") === Seq("a", "b", "c", "d", "e", "zz")(rnd.nextInt(6))
      case 3 => col("cat").isin(Seq("a", "c").map(lit(_)): _*) || col("id") < 50L
      case 4 => col("tag").isNull
      case 5 => col("tag").isNotNull && col("v") > rnd.nextInt(17).toLong
      case 6 => col("id") > (rnd.nextInt(3000)).toLong && col("id") <= (rnd.nextInt(3000) + 500).toLong
      case 7 => col("cat") >= "b" && col("cat") < "e"
    }
    if (rnd.nextBoolean()) one() else one() && one()
  }

  test("100 random predicates: graft == parquet on the token layout") {
    val plain = spark.read.parquet(plainDir).drop("_graft_token")
    val g = graftRead(graftDir).drop("_graft_token")
    (1 to 100).foreach { i =>
      val f = randomFilter()
      val expected = plain.filter(f)
      val got = g.filter(f)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"iteration $i diverged for filter: $f")
    }
  }

  test("100 random predicates: graft == parquet on the dir-partitioned layout") {
    val plain = spark.read.parquet(plainDir).drop("_graft_token")
    val dp = graftRead(dirPartDir).drop("_graft_token")
    (1 to 100).foreach { i =>
      val f = randomFilter()
      val expected = plain.filter(f)
      val got = dp.filter(f)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"iteration $i diverged for filter: $f")
    }
  }

  test("random-ring layout: no token pruning applies, pk-stats pruning stays sound") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, s"v${i % 7}")).toDF("id", "tag")
    val plain = Files.createTempDirectory("graft_rr_plain_").toString + "/t"
    df.write.parquet(plain)
    val rr = Files.createTempDirectory("graft_rr_g_").toString + "/t"
    TokenSortedWriter.write(df, CqlSchema("t", Seq("id")), rr, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 4, partitioner = "random",
        keepTokenColumn = true))
    val all = TokenPruner.listFiles(spark, rr)
    // binary tokens carry no long stats: token pruning must disqualify itself
    assert(all.forall(_.tokenRange.isEmpty), "127-bit tokens must not fake long ranges")
    // pk-column stats still prune; results match plain parquet on a battery
    // of predicate shapes
    val p = spark.read.parquet(plain)
    val g = graftRead(rr).drop("_graft_token")
    Seq[Column](
      col("id") === 1L, col("id") === 2000L, col("id") > 1990L,
      col("id").isin(3L, 999L, 2001L), col("tag") === "v3" && col("id") <= 100L)
      .foreach { f =>
        val expected = p.filter(f)
        val got = g.filter(f)
        assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
          s"random-ring diverged for $f")
      }
  }

  // Targeted coverage of the allowsStats predicate shapes beyond EqualTo
  // (ADVICE: range bounds, In, Or/And composition were fuzz-only before).
  test("stats pruning: range predicates drop out-of-range files and keep boundary files") {
    import org.apache.spark.sql.sources._
    val all = TokenPruner.listFiles(spark, graftDir)
    val sk = CqlSchema("t", Seq("id"))
    val ids = all.flatMap(_.pkRanges.get("id"))
    assert(ids.length == all.length, "fixture files must carry id stats")
    val globalMax = ids.map(_._2).max
    // > max prunes everything; >= max keeps only files whose max == max
    assert(TokenPruner.prune(spark, all, Array(GreaterThan("id", globalMax)), sk).isEmpty)
    val ge = TokenPruner.prune(spark, all, Array(GreaterThanOrEqual("id", globalMax)), sk)
    assert(ge.nonEmpty && ge.forall(_.pkRanges("id")._2 == globalMax))
    // < min of the second file keeps exactly the files overlapping below it
    val sortedMins = ids.map(_._1).sorted
    val cut = sortedMins(1)
    val lt = TokenPruner.prune(spark, all, Array(LessThan("id", cut)), sk)
    assert(lt.nonEmpty && lt.length < all.length)
    assert(lt.forall(_.pkRanges("id")._1 < cut))
    // In: values all inside one file's range keep >= that file, never zero
    val (mn0, _) = ids.minBy(_._1)
    val in = TokenPruner.prune(spark, all, Array(In("id", Array[Any](mn0))), sk)
    assert(in.nonEmpty && in.forall(f =>
      f.pkRanges("id")._1 <= mn0 && mn0 <= f.pkRanges("id")._2))
    // Or spanning two disjoint files keeps both sides; And intersects
    val (_, mxTop) = ids.maxBy(_._2)
    val or = TokenPruner.prune(spark, all,
      Array(Or(EqualTo("id", mn0), EqualTo("id", mxTop))), sk)
    assert(or.exists(f => f.pkRanges("id")._1 <= mn0 && mn0 <= f.pkRanges("id")._2))
    assert(or.exists(f => f.pkRanges("id")._1 <= mxTop && mxTop <= f.pkRanges("id")._2))
    val and = TokenPruner.prune(spark, all,
      Array(And(GreaterThan("id", mxTop - 1), LessThanOrEqual("id", mxTop))), sk)
    assert(and.nonEmpty && and.forall(_.pkRanges("id")._2 >= mxTop))
  }

  test("as-of time travel: a writetime bound prunes whole newer generations") {
    import org.apache.spark.sql.sources._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_asof_gen_").toString + "/t"
    val sk = CqlSchema("t", Seq("id"))
    val base = (1L to 500L).map(i => (i, i)).toDF("id", "v")
    TokenSortedWriter.write(base, sk, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true,
        writetimeMicros = Some(1000L)))
    TokenSortedWriter.write(base.withColumn("v", col("v") + 100L), sk, dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true,
        writetimeMicros = Some(2000L)))
    val all = TokenPruner.listFiles(spark, dir)
    assert(all.length == 4)
    // as-of T=1500: every generation-2 file has writetime min 2000 > 1500
    val old = TokenPruner.prune(spark, all,
      Array(LessThanOrEqual(TokenSortedWriter.WritetimeCol, 1500L)), sk)
    assert(old.length == 2, s"expected only generation 1, got ${old.length}")
    assert(old.forall(_.pkRanges(TokenSortedWriter.WritetimeCol) == ((1000L, 1000L))))
    // and the full as-of READ returns generation-1 values
    val asOf = spark.read.format("graft").option("path", dir).option("pk", "id").load()
      .filter(col(TokenSortedWriter.WritetimeCol) <= 1500L)
    assert(asOf.count() == 500L)
    assert(asOf.agg(max(col("v"))).head().getLong(0) == 500L)
  }

  test("random limits compose with random predicates (row counts, not content)") {
    val plain = spark.read.parquet(plainDir)
    val g = graftRead(graftDir)
    (1 to 30).foreach { i =>
      val f = randomFilter()
      val n = rnd.nextInt(40) + 1
      val expected = math.min(plain.filter(f).count(), n.toLong)
      assert(g.filter(f).limit(n).count() == expected, s"iteration $i, limit $n, filter $f")
      assert(g.limit(n).count() == math.min(3000L, n.toLong), s"bare limit $n")
    }
  }
}
