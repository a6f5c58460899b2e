package graft.tables

import graft.model.CqlSchema
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Catalog of the driver-provided test tables (TESTDATA.md): one parquet file
 * per table under `$sfDir/<name>.parquet`, annotated with the pk/ck role
 * mapping from FIXTURES.md §1 (which mirrors how the reference declares key
 * roles via `StructField.metadata`, `DataLayer.java:118-129`).
 *
 * Scale notes:
 *  - `spark.read.parquet` is the 100 TB path: file-splittable scans, footer
 *    min/max row-group pruning, vectorized decoding, pushed filters. Nothing
 *    here collects to the driver.
 *  - Role annotation is a metadata-only projection (see CqlSchema.annotate);
 *    it does not break pushdown or codegen.
 */
object Tables {

  /** pk/ck role mapping per FIXTURES.md §1. */
  val schemas: Map[String, CqlSchema] = Map(
    "region"     -> CqlSchema("region", Seq("r_regionkey")),
    "nation"     -> CqlSchema("nation", Seq("n_nationkey")),
    "customer"   -> CqlSchema("customer", Seq("c_custkey")),
    "supplier"   -> CqlSchema("supplier", Seq("s_suppkey")),
    "part"       -> CqlSchema("part", Seq("p_partkey")),
    "orders"     -> CqlSchema("orders", Seq("o_orderkey")),
    "lineitem"   -> CqlSchema("lineitem", Seq("l_orderkey"), Seq("l_linenumber")),
    "events"     -> CqlSchema("events", Seq("user_id"), Seq("ts", "event_id")),
    "documents"  -> CqlSchema("documents", Seq("doc_id")),
    "embeddings" -> CqlSchema("embeddings", Seq("vec_id"))
  )

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Load one test table with role metadata attached.
   *
   *  `events.parquet` has shipped with different physical encodings for `ts`
   *  across driver fixture refreshes, so the loader branches on the RESOLVED
   *  Spark type instead of assuming one encoding (see [[loadEvents]]). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df =
      if (name == "events") loadEvents(spark, path(sfDir, name))
      else spark.read.parquet(path(sfDir, name))
    schemas.get(name).map(_.annotate(df)).getOrElse(df)
  }

  /** Load the events table, normalizing `ts` to session-zone TimestampType
   *  whatever the parquet file's physical encoding:
   *
   *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) → resolves as TimestampNTZ;
   *     cast to TimestampType (session zone is UTC, so wall-clock semantics
   *     are identical and DuckDB's `CAST(ts AS TIMESTAMP)` oracle agrees).
   *   - TIMESTAMP(MICROS, isAdjustedToUTC=true) → already TimestampType.
   *   - TIMESTAMP(NANOS) → rejected outright by the reader
   *     ([PARQUET_TYPE_ILLEGAL]); retry with the legacy nanosAsLong flag
   *     scoped to resolution, then rebuild micros with floor(ns/1000) — the
   *     same truncation DuckDB applies, so oracles stay bit-aligned. */
  private def loadEvents(spark: SparkSession, p: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw =
      try spark.read.parquet(p)
      catch {
        case e: Exception if chainMentionsNanos(e) =>
          // scope the legacy nanos flag to THIS read and restore it after:
          // leaving it set would make every later TIMESTAMP(NANOS) read in
          // the session silently surface raw longs instead of failing fast
          val key = "spark.sql.legacy.parquet.nanosAsLong"
          val prev = spark.conf.getOption(key)
          spark.conf.set(key, "true")
          try {
            val r = spark.read.parquet(p)
            // force plan RESOLUTION while the flag is on; execution reads
            // the already-resolved schema
            r.schema
            r
          } finally prev match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
      }
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet encoding resolved as $other")
    }
  }

  private def chainMentionsNanos(e: Throwable): Boolean = {
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists { t =>
      val m = Option(t.getMessage).getOrElse("")
      m.contains("NANOS") || m.contains("nanosAsLong") ||
        m.contains("PARQUET_TYPE_ILLEGAL") || m.contains("Illegal Parquet type")
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
