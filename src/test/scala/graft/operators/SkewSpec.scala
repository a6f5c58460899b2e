package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  private lazy val fact = {
    import spark.implicits._
    // heavily skewed: 90% of rows share key 1
    (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 100 else 1L, i.toLong))
      .toDF("k", "v")
  }
  private lazy val dim = {
    import spark.implicits._
    (0L to 99L).map(k => (k, s"dim_$k")).toDF("k", "name")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("salted inner join is row-identical to the plain join") {
    val plain = fact.join(dim, Seq("k"), "inner").select("k", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salt = 8, "inner")
      .select("k", "v", "name")
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("salted left join preserves unmatched fact rows exactly once") {
    val factWithMiss = fact.union(spark.range(1).select(lit(5000L).as("k"), lit(-1L).as("v")))
    val plain = factWithMiss.join(dim, Seq("k"), "left").select("k", "v", "name")
    val salted = Skew.saltedJoin(factWithMiss, dim, Seq("k"), salt = 4, "left")
      .select("k", "v", "name")
    assert(sortedRows(salted) == sortedRows(plain))
  }

  test("salted left_anti keeps exactly the unmatched rows") {
    val factWithMiss = fact.union(spark.range(1).select(lit(5000L).as("k"), lit(-1L).as("v")))
    val salted = Skew.saltedJoin(factWithMiss, dim, Seq("k"), salt = 4, "left_anti")
    assert(salted.count() == 1 && salted.head().getLong(0) == 5000L)
  }

  test("right/full joins are rejected") {
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), salt = 4, "right")
    }
    assert(e.getMessage.contains("saltedJoin supports"))
  }
}
