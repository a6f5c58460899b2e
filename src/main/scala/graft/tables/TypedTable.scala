package graft.tables

import graft.model.CqlSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The complex-type fixture: a deterministic table with every composite shape
 * the reference's type surface exercises — collections, tuples/UDT analogs,
 * nested collections-of-structs, decimal and date/timestamp edges
 * (reference: `EndToEndTests.java:988` testNestedMapSet, `:1614`
 * testDeepNestedUDT, and the whole `cassandra-analytics-spark-converter`
 * module mapping CQL list/set/map/tuple/UDT onto Spark array/map/struct —
 * SURVEY §1.2).
 *
 * Derived 1:1 from the driver's `part` table, so a DuckDB oracle can
 * recompute every projected value from `part` directly:
 *
 *  - `tags    array<string>`          — CQL `list<text>` analog
 *  - `tag_set array<string>` w/ dups  — CQL `set<text>` analog; built WITH
 *    duplicates so set-style re-dedup (`array_sort(array_distinct(..))`) is
 *    observable after the round-trip
 *  - `attrs   map<string,bigint>`     — CQL `map<text,bigint>`
 *  - `brand_info struct<brand,sz,price:decimal(12,2)>` — tuple/UDT analog
 *    with a decimal field
 *  - `words   array<struct<w,len>>`   — nested collection-of-UDT
 *    (`frozen<list<udt>>` analog)
 *  - `d date`, `ts timestamp` (micros), `note string` nullable (null every
 *    7th row) — scalar edge cases riding along
 *
 * The float→long derivation uses `floor` (truncation), never cast-rounding:
 * DuckDB CAST(double AS BIGINT) rounds half-to-even while Spark's cast
 * truncates — floor on both sides sidesteps the disagreement.
 */
object TypedTable {

  val schema: CqlSchema = CqlSchema("typed", Seq("p_partkey"))

  def fromPart(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      split(col("p_name"), " ").as("tags"),
      concat(split(col("p_name"), " "), split(col("p_name"), " "),
        array(col("p_type"))).as("tag_set"),
      map(
        lit("size"), col("p_size").cast("long"),
        lit("retail_cents"), floor(col("p_retailprice") * 100).cast("long")).as("attrs"),
      struct(
        col("p_brand").as("brand"),
        col("p_size").as("sz"),
        col("p_retailprice").cast("decimal(12,2)").as("price")).as("brand_info"),
      transform(split(col("p_name"), " "),
        w => struct(w.as("w"), length(w).cast("long").as("len"))).as("words"),
      date_add(lit("1992-01-01").cast("date"), col("p_size")).as("d"),
      expr("timestamp_micros(p_partkey * 1000001 + 123456)").as("ts"),
      when(col("p_partkey") % 7 === 0, lit(null)).otherwise(col("p_brand")).as("note"),
      // remaining scalar edges of the reference type matrix (SURVEY §1.2):
      // blob→binary, smallint→short, tinyint→byte, varint→decimal(38,0)
      encode(col("p_brand"), "UTF-8").as("bin"),
      col("p_size").cast("short").as("small"),
      (col("p_size") % 100).cast("byte").as("tiny"),
      floor(col("p_retailprice") * 1000000).cast("decimal(38,0)").as("varint_ish"),
      // three-level UDT nesting with a collection at the innermost level
      // (`EndToEndTests.testDeepNestedUDT:1614` — UDT<UDT<UDT, list>>):
      // every leaf is reachable only through the full chain, so a
      // round-trip that flattens, reorders or re-types ANY level breaks
      // the q84 projection hash
      struct(
        struct(
          struct(
            col("p_type").as("leaf"),
            col("p_size").cast("long").as("n")).as("level2"),
          split(col("p_type"), " ").as("codes"),
          (col("p_partkey") % 10).as("sib")).as("level1"),
        col("p_brand").as("top")).as("deep"))
}
