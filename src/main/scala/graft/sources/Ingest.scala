package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Ingestion readers for the raw formats training corpora actually arrive
 * in — JSONL and CSV — with the contracts that matter at 100 TB baked in
 * rather than left to defaults:
 *
 *  - EXPLICIT schema, never inference: `inferSchema` is a full extra pass
 *    over the corpus before the real read, and on messy crawl data it
 *    infers a different schema per day, silently breaking appends.
 *  - FAILFAST by default: a malformed record aborts the job with the bad
 *    line in the error, instead of Spark's default PERMISSIVE nulling —
 *    at corpus scale, silent nulls are unnoticed data loss. Deliberately
 *    lossy ingestion opts in via [[jsonlPermissive]]/[[csvPermissive]],
 *    which KEEP the corrupt record in `_corrupt_record` so the reject
 *    stream can be quarantined and counted rather than dropped.
 *  - multiline off (the default): one record per line keeps the format
 *    splittable — a multiline JSON/CSV file cannot be split across tasks
 *    and serializes the whole file through one core.
 *
 * Downstream is the normal pipeline: clean → curate → token-sorted graft
 * write ([[graft.write.TokenSortedWriter]]).
 */
object Ingest {

  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Lossy path: corrupt lines land in `_corrupt_record` (schema must NOT
   *  already contain that column), clean fields parse as usual. Spark
   *  refuses a query that reads ONLY the corrupt column from raw files —
   *  cache() the parsed frame before splitting it into clean/reject
   *  streams (which a quarantine pass wants anyway: one parse, two
   *  outputs). */
  def jsonlPermissive(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Splittable CSV read: quoting covers embedded delimiters, quotes and
   *  unicode (q121 pins the round trip by hash), but embedded NEWLINES in
   *  a field are out of contract — they require `multiline`, which
   *  serializes each file through one core. Strip or escape newlines at
   *  write time (Spark's CSV writer quotes them, but only a multiline
   *  reader can get them back). */
  def csv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .option("header", header)
      .option("sep", delimiter)
      .csv(path)

  /** Columnar interchange with ORC-based warehouses (Hive/Trino lakes):
   *  explicit schema like every reader here — ORC carries its own schema
   *  per file, and pinning one makes day-over-day appends drift-proof
   *  (missing columns null in, extra columns are refused by name). ORC is
   *  splittable and predicate/pruning-capable like parquet, so a corpus
   *  landed as ORC can be curated IN PLACE and only the survivors
   *  rewritten to the graft layout. */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC export (one well-compressed interchange copy; zstd like the
   *  parquet side). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)

  def csvPermissive(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", header)
      .option("sep", delimiter)
      .csv(path)
}
