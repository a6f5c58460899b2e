package graft.operators

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(10)),
    (2L, Some("b"), None),
    (3L, Some("b"), Some(30)),
    (4L, None, Some(30)))
    .toDF("id", "s", "v")

  test("summarize: one row per column with exact counts and stringified min/max") {
    val got = Profiling.summarize(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") === (("id", 4L, 0L, 4L, "1", "4")))
    assert(got("s") === (("s", 4L, 1L, 2L, "a", "b")))
    assert(got("v") === (("v", 4L, 1L, 2L, "10", "30")))
  }

  test("summarize: min/max order natively (numeric, not lexicographic)") {
    val n = Seq(9, 10, 100).toDF("x")
    val row = Profiling.summarize(n, Seq("x"))
      .as[(String, Long, Long, Long, String, String)].head()
    assert(row._5 === "9" && row._6 === "100") // "100" < "9" lexicographically
  }

  test("summarize approx path: same schema, exact cells exact, distincts close") {
    val got = Profiling.summarize(df, Seq("id", "s"), exactDistinct = false)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // rows/nulls/min/max are exact regardless; n_distinct from the sketch
    // is exact at this cardinality
    assert(got("id") === (("id", 4L, 0L, 4L, "1", "4")))
    assert(got("s") === (("s", 4L, 1L, 2L, "a", "b")))
  }

  test("summarize handles dotted column names literally") {
    val dotted = df.withColumnRenamed("v", "a.b")
    val row = Profiling.summarize(dotted, Seq("a.b"))
      .as[(String, Long, Long, Long, String, String)].head()
    assert(row === (("a.b", 4L, 1L, 2L, "10", "30")))
  }

  test("summarize rejects unknown columns") {
    val e = intercept[IllegalArgumentException] {
      Profiling.summarize(df, Seq("nope"))
    }
    assert(e.getMessage.contains("no such column"))
  }
}
