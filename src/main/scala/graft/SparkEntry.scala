package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The implementation lives in [[graft.queries.Battery]]; operators in
  * `graft.operators`, sources/sinks in `graft.tables` / `graft.write`. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Battery.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Battery.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries (non-SQL-expressible ops,
    * e.g. minhash/simhash/LSH) get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] = graft.queries.Battery.oracles
}
