package graft.tables

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Guard against driver-side fixture refreshes silently changing schemas the
 *  battery depends on (round-8 post-mortem: a regenerated `events.parquet`
 *  switched `ts` from TIMESTAMP(NANOS) to TIMESTAMP(MICROS,NTZ) and zeroed
 *  11/134 battery queries with no code change and no failing test).
 *
 *  Two layers:
 *   1. Read every driver fixture table at sf0.001 through `Tables.table` and
 *      assert the column names/types the battery assumes.
 *   2. Synthesize the `ts` encodings the events loader must normalize
 *      (MICROS-NTZ, MICROS-UTC, plain INT64) and assert each resolves to
 *      session-zone TimestampType with identical wall-clock values.
 *      (TIMESTAMP(NANOS) itself is unwritable from Spark — the legacy-flag
 *      retry path is covered by the LongType rebuild arithmetic here plus
 *      the error-chain match in `Tables.chainMentionsNanos`.)
 */
class FixtureDriftSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def fixturesPresent = new java.io.File(s"$sfDir/events.parquet").exists()

  /** battery-assumed (name → type) per table; extra columns are tolerated,
   *  missing or retyped ones fail loudly. */
  private val assumed: Map[String, Map[String, DataType]] = Map(
    "region"   -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation"   -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType, "n_name" -> StringType),
    "customer" -> Map("c_custkey" -> LongType, "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType),
    "part"     -> Map("p_partkey" -> LongType, "p_retailprice" -> DoubleType),
    "orders"   -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
                      "o_totalprice" -> DoubleType, "o_orderstatus" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
                      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
                      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
                      "l_returnflag" -> StringType),
    "events"   -> Map("event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
                      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
                       "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  test("driver fixtures at sf0.001 carry the schemas the battery assumes") {
    assume(fixturesPresent, s"driver fixtures not present under $sfDir")
    val diffs = assumed.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      val actual = Tables.table(spark, sfDir, name).schema
        .map(f => f.name -> f.dataType).toMap
      cols.flatMap { case (c, t) =>
        actual.get(c) match {
          case None => Some(s"$name.$c: MISSING (have ${actual.keys.toSeq.sorted.mkString(",")})")
          case Some(a) if a != t => Some(s"$name.$c: expected $t, fixture now resolves as $a")
          case _ => None
        }
      }
    }
    assert(diffs.isEmpty, "fixture drift:\n" + diffs.mkString("\n"))
  }

  test("fixture tables are non-empty at sf0.001") {
    assume(fixturesPresent, s"driver fixtures not present under $sfDir")
    assumed.keys.foreach { name =>
      assert(Tables.table(spark, sfDir, name).limit(1).count() == 1L, s"$name is empty")
    }
  }

  // --- events-loader encoding matrix ------------------------------------

  /** micros since epoch for 2024-01-02T03:04:05.123456Z */
  private val micros = 1704164645123456L

  private def writeEvents(dir: String, tsField: StructField, tsValue: Any): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField, StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    val rows = java.util.List.of(Row(1L, tsValue, 7L, "click", 1.5, "{}"))
    spark.createDataFrame(rows, schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedTs(dir: String): (DataType, Long) = {
    val df = Tables.table(spark, dir, "events")
    val tpe = df.schema("ts").dataType
    import org.apache.spark.sql.functions.unix_micros
    val v = df.select(unix_micros(org.apache.spark.sql.functions.col("ts"))).head.getLong(0)
    (tpe, v)
  }

  test("events loader: MICROS-NTZ encoding → TimestampType, same wall clock") {
    val dir = Files.createTempDirectory("graft-ntz").toString
    writeEvents(dir, StructField("ts", TimestampNTZType),
      java.time.LocalDateTime.ofEpochSecond(micros / 1000000, (micros % 1000000).toInt * 1000,
        java.time.ZoneOffset.UTC))
    assert(loadedTs(dir) == (TimestampType, micros))
  }

  test("events loader: MICROS-UTC encoding → passes through as TimestampType") {
    val dir = Files.createTempDirectory("graft-utc").toString
    writeEvents(dir, StructField("ts", TimestampType),
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(micros / 1000000,
        (micros % 1000000) * 1000)))
    assert(loadedTs(dir) == (TimestampType, micros))
  }

  test("events loader: raw INT64 nanos → floor-to-micros TimestampType") {
    val dir = Files.createTempDirectory("graft-nanos").toString
    // nanos value with sub-micro residue 789 — loader must floor, not round
    writeEvents(dir, StructField("ts", LongType), micros * 1000L + 789L)
    assert(loadedTs(dir) == (TimestampType, micros))
  }
}
