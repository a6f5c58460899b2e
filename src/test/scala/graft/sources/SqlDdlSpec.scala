package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CqlSchema
import graft.write.TokenSortedWriter
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The SQL-facing surface of the graft source: `CREATE TABLE … USING graft`
 *  + plain `SELECT`/`INSERT INTO` — a reference user's spark.sql workflow
 *  (the reference registers its DSv2 provider the same way; DataFrame and
 *  SQL paths must agree). */
class SqlDdlSpec extends SparkSpec {

  test("CREATE TABLE USING graft + SELECT sees the token-sorted data") {
    val dir = Files.createTempDirectory("graft_sql_").toString + "/t"
    import spark.implicits._
    TokenSortedWriter.write((1L to 300L).map(i => (i, s"n$i", i % 5)).toDF("id", "name", "grp"),
      CqlSchema("t", Seq("id")), dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true))
    spark.sql("DROP TABLE IF EXISTS graft_sql_t")
    spark.sql(
      s"""CREATE TABLE graft_sql_t USING graft
         |OPTIONS (path '$dir', pk 'id', table 't')""".stripMargin)
    try {
      assert(spark.sql("SELECT count(*) AS n FROM graft_sql_t").head().getLong(0) == 300L)
      assert(spark.sql("SELECT name FROM graft_sql_t WHERE id = 42").head().getString(0) == "n42")
      // pushdown still applies through the SQL path
      val plan = spark.sql("SELECT name FROM graft_sql_t WHERE id = 42")
        .queryExecution.executedPlan.toString
      assert(plan.contains("GraftScan") && plan.contains("pushedKeyTokens=1"),
        s"SQL path must hit the same pruned scan:\n$plan")
      // aggregation over the SQL-registered table
      val g = spark.sql(
        "SELECT grp, count(*) AS n FROM graft_sql_t GROUP BY grp ORDER BY grp")
      assert(g.collect().map(_.getLong(1)).sum == 300L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_t")
  }

  test("INSERT INTO a graft SQL table appends through the token-sorted sink") {
    val dir = Files.createTempDirectory("graft_sqlw_").toString + "/t"
    import spark.implicits._
    TokenSortedWriter.write((1L to 10L).map(i => (i, i)).toDF("id", "v"),
      CqlSchema("t", Seq("id")), dir, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true))
    spark.sql("DROP TABLE IF EXISTS graft_sqlw_t")
    spark.sql(s"CREATE TABLE graft_sqlw_t USING graft OPTIONS (path '$dir', pk 'id')")
    try {
      spark.sql("INSERT INTO graft_sqlw_t SELECT id + 100, id FROM range(1, 6) AS r(id)")
      assert(spark.sql("SELECT count(*) FROM graft_sqlw_t").head().getLong(0) == 15L)
      // the appended rows went through the tokenizer: every data file still
      // carries token stats (the write path wasn't bypassed)
      val metas = TokenPruner.listFiles(spark, dir)
      assert(metas.nonEmpty && metas.forall(_.tokenRange.isDefined),
        "INSERT INTO must flow through the token-sorted writer")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sqlw_t")
  }
}
