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
