package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * CQL uuid/timeuuid comparison semantics over their Spark string surface.
 *
 * The reference converts uuid AND timeuuid columns to strings in Spark but
 * compares them *as java.util.UUID* (reference: cassandra-analytics-common
 * `cqlandra/CqlField.java:57` `UUID_COMPARATOR = comparing(UUID::fromString)`;
 * `SparkSqlTypeConverter.java:33-139` maps uuid→StringType). Java's
 * `UUID.compareTo` orders by SIGNED mostSigBits then SIGNED leastSigBits —
 * which is neither lexicographic string order nor the unsigned/bytewise
 * order DuckDB's native UUID type uses. These helpers expose that exact
 * ordering as plain Catalyst columns.
 *
 * Everything here composes built-in codegen'd functions (`conv`, `substring`,
 * arithmetic) — no UDF, no custom expression needed: the 64-bit halves are
 * assembled from two 32-bit hex parses so all arithmetic stays inside
 * BIGINT under ANSI mode (a single 16-hex-digit `conv` would produce an
 * unsigned value ≥ 2^63 that cannot cast back to long).
 */
object Uuid {

  /** Signed 64-bit value of 16 hex digits given as two 8-digit halves. */
  private def hex64(hi8: Column, lo8: Column): Column = {
    val hi = conv(hi8, 16, 10).cast("long")
    val lo = conv(lo8, 16, 10).cast("long")
    (when(hi >= 2147483648L, hi - 4294967296L).otherwise(hi)) * 4294967296L + lo
  }

  /** `UUID.getMostSignificantBits` of a canonical 8-4-4-4-12 uuid string. */
  def msb(u: Column): Column =
    hex64(substring(u, 1, 8), concat(substring(u, 10, 4), substring(u, 15, 4)))

  /** `UUID.getLeastSignificantBits` of a canonical uuid string. */
  def lsb(u: Column): Column =
    hex64(concat(substring(u, 20, 4), substring(u, 25, 4)), substring(u, 29, 8))

  /** Sort key with `java.util.UUID.compareTo` semantics: order by this
   *  struct to order by UUID (structs compare field-by-field). */
  def sortKey(u: Column): Column = struct(msb(u).as("msb"), lsb(u).as("lsb"))

  /** Canonical 8-4-4-4-12 uuid string from 32 hex chars (e.g. an md5). */
  def format(hex32: Column): Column =
    concat_ws("-",
      substring(hex32, 1, 8), substring(hex32, 9, 4), substring(hex32, 13, 4),
      substring(hex32, 17, 4), substring(hex32, 21, 12))
}
