package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.normalizeUnicode(col("t"))).head().getString(0)
  private def fold(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.stripAccents(col("t"))).head().getString(0)

  test("NFC composes combining marks; already-normalized text is unchanged") {
    assert(norm("Café") == "Café") // e + combining acute -> composed
    assert(norm("Café") == "Café")
    val viaSql = spark.sql("SELECT unicode_normalize('Café', 'NFC') AS n")
      .head().getString(0)
    assert(viaSql == "Café", "SQL registration must work")
  }

  test("typographic quotes, dashes, exotic spaces, and controls normalize") {
    assert(norm("‘a’ “b”") == "'a' \"b\"")
    assert(norm("x—y–z−w") == "x-y-z-w")
    assert(norm("a b c　d") == "a b c d") // NBSP, thin, ideographic
    assert(norm("ab c") == "ab c") // BEL stripped
    assert(norm("keep\nlines\tand tabs") == "keep\nlines and tabs")
  }

  test("space runs collapse and ends trim") {
    assert(norm("  a   b\t\tc  ") == "a b c")
  }

  test("stripAccents folds marks but keeps base letters and case") {
    assert(fold("Caf\u00e9 na\u00efve \u00dcn\u00efcode") == "Cafe naive Unicode")
    assert(fold("ASCII stays") == "ASCII stays")
  }

  test("normalization is a pure codegen projection (no shuffle, no UDF)") {
    val df = spark.range(100)
      .selectExpr("id", "concat('t ', id) AS t")
      .select(col("id"), TextAnalysis.normalizeUnicode(col("t")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"))
    assert(plan.contains("WholeStageCodegen") || plan.contains("Project"))
  }
}
