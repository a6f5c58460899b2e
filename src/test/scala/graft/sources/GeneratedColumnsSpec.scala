package graft.sources

import java.nio.file.Files
import java.time.ZoneId

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** GENERATED ALWAYS AS columns: DDL round-trip, write-side compute +
 *  validation, DML recompute, and source-filter → generated-column
 *  pruning inference. */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog(): (String, String) = {
    val cat = "ggen" + java.util.UUID.randomUUID().toString.take(8)
    val base = Files.createTempDirectory("graft_genspec_").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    (cat, base)
  }

  private val zone = ZoneId.of("UTC")

  /** The DESCRIPTOR schema — Spark's relation output strips the
   *  generation-expression key (Table.columns() lifts it onto the v2
   *  Column), so engine hooks read the descriptor-loaded schema. */
  private def metaSchema(base: String, tbl: String): StructType = {
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/db/$tbl/${GraftCatalog.MetaFile}")))
    DataType.fromJson(json.linesIterator.next()).asInstanceOf[StructType]
  }

  test("DDL round-trip: the generation expression persists in the " +
      "descriptor and INSERT computes the omitted column") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.ev (id BIGINT, ts TIMESTAMP, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
      "USING graft OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    assert(GeneratedColumns.expressions(metaSchema(base, "ev")).map(_._1) == Seq("day"))
    spark.sql(s"INSERT INTO $cat.db.ev (id, ts) VALUES " +
      "(1, TIMESTAMP'2024-03-05 10:00:00'), (2, TIMESTAMP'2024-03-06 23:59:59')")
    val out = spark.sql(s"SELECT id, CAST(day AS STRING) FROM $cat.db.ev")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "2024-03-05", 2L -> "2024-03-06"))
  }

  test("write validation: a provided value that matches is kept, a " +
      "mismatch fails the write loudly, an explicit NULL is computed") {
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.v (id BIGINT, ts TIMESTAMP, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
      "USING graft OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    spark.sql(s"INSERT INTO $cat.db.v VALUES " +
      "(1, TIMESTAMP'2024-01-02 03:04:05', DATE'2024-01-02'), " + // correct
      "(2, TIMESTAMP'2024-01-03 03:04:05', NULL)")                // computed
    val ok = spark.sql(s"SELECT id, CAST(day AS STRING) FROM $cat.db.v")
      .as[(Long, String)].collect().toMap
    assert(ok == Map(1L -> "2024-01-02", 2L -> "2024-01-03"))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.db.v VALUES " +
        "(3, TIMESTAMP'2024-01-04 03:04:05', DATE'1999-09-09')")
    }
    assert(exceptionChain(e).exists(_.getMessage != null) &&
      exceptionChain(e).exists(m => Option(m.getMessage)
        .exists(_.contains("GENERATED ALWAYS AS column day"))),
      s"expected the generated-column mismatch error, got $e")
  }

  private def exceptionChain(e: Throwable): List[Throwable] =
    e :: Option(e.getCause).map(exceptionChain).getOrElse(Nil)

  test("DML recompute: an UPDATE that moves the source column carries " +
      "the generated column with it") {
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.u (id BIGINT, ts TIMESTAMP, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
      "USING graft OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    spark.sql(s"INSERT INTO $cat.db.u (id, ts) VALUES " +
      "(1, TIMESTAMP'2024-01-01 12:00:00'), (2, TIMESTAMP'2024-01-01 18:00:00')")
    spark.sql(s"UPDATE $cat.db.u SET ts = ts + INTERVAL 2 DAYS WHERE id = 2")
    val out = spark.sql(s"SELECT id, CAST(day AS STRING) FROM $cat.db.u")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "2024-01-01", 2L -> "2024-01-03"))
  }

  test("derive: cast-to-date maps ranges (weakened to inclusive) and " +
      "equality; year maps too; non-source filters derive nothing") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("day", DateType, nullable = true,
        new MetadataBuilder()
          .putString("GENERATION_EXPRESSION", "CAST(ts AS DATE)").build()),
      StructField("yr", IntegerType, nullable = true,
        new MetadataBuilder()
          .putString("GENERATION_EXPRESSION", "year(ts)").build())))
    val t0 = java.sql.Timestamp.valueOf("2024-03-05 10:30:00")
    val derived = GeneratedColumns.derive(
      Array(GreaterThan("ts", t0)), schema, zone).toSet
    assert(derived == Set[Filter](
      GreaterThanOrEqual("day", java.sql.Date.valueOf("2024-03-05")),
      GreaterThanOrEqual("yr", 2024)))
    val eq = GeneratedColumns.derive(Array(EqualTo("ts", t0)), schema, zone).toSet
    assert(eq == Set[Filter](
      EqualTo("day", java.sql.Date.valueOf("2024-03-05")),
      EqualTo("yr", 2024)))
    assert(GeneratedColumns.derive(
      Array(EqualTo("other", 1)), schema, zone).isEmpty)
  }

  test("derive: substring prefix maps equality only; And splits, Or " +
      "requires both sides") {
    val schema = StructType(Seq(
      StructField("url", StringType),
      StructField("pfx", StringType, nullable = true,
        new MetadataBuilder()
          .putString("GENERATION_EXPRESSION", "substring(url, 1, 4)").build())))
    assert(GeneratedColumns.derive(
      Array(EqualTo("url", "https://x")), schema, zone).toSet ==
      Set[Filter](EqualTo("pfx", "http")))
    assert(GeneratedColumns.derive(
      Array(GreaterThan("url", "https://x")), schema, zone).isEmpty)
    val or = GeneratedColumns.derive(Array(Or(
      EqualTo("url", "https://a"), EqualTo("url", "ftp://b"))), schema, zone)
    assert(or.toSet == Set[Filter](Or(EqualTo("pfx", "http"), EqualTo("pfx", "ftp:"))))
    val and = GeneratedColumns.derive(Array(And(
      EqualTo("url", "https://a"), GreaterThan("url", "a"))), schema, zone)
    assert(and.toSet == Set[Filter](EqualTo("pfx", "http")))
  }

  test("zone safety: the CREATE-time session zone is recorded; a write " +
      "under a different session zone refuses instead of storing days " +
      "the table's derivation would disagree with") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.z (id BIGINT, ts TIMESTAMP, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
      "USING graft OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    val created = spark.conf.get("spark.sql.session.timeZone")
    val sch = metaSchema(base, "z")
    assert(sch("day").metadata.getString(GeneratedColumns.ZoneKey) ==
      java.time.ZoneId.of(created).getId)
    spark.sql(s"INSERT INTO $cat.db.z (id, ts) VALUES (1, TIMESTAMP'2024-01-01 10:00:00')")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Australia/Sydney")
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.db.z (id, ts) VALUES " +
          "(2, TIMESTAMP'2024-01-02 10:00:00')")
      }
      def chain(t: Throwable): List[Throwable] =
        t :: Option(t.getCause).map(chain).getOrElse(Nil)
      assert(chain(e).exists(t => Option(t.getMessage)
        .exists(_.contains("session timeZone"))), s"got $e")
      // derivation maps bounds in the RECORDED zone even when the session
      // zone moved: a UTC-created day column keeps UTC day arithmetic
      val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-05T23:30:00Z"))
      val derived = GeneratedColumns.derive(
        Array(GreaterThanOrEqual("ts", t0)), sch,
        GeneratedColumns.sessionZone(spark))
      assert(derived.toSet == Set[Filter](
        GreaterThanOrEqual("day", java.sql.Date.valueOf("2024-03-05"))),
        s"got ${derived.toSeq} — Sydney arithmetic would have said 2024-03-06")
    } finally spark.conf.set("spark.sql.session.timeZone", created)
  }

  test("derive: date_format with chronological-prefix patterns maps " +
      "ranges (monthly string partitions); non-prefix patterns derive " +
      "nothing") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("ym", StringType, nullable = true,
        new MetadataBuilder()
          .putString("GENERATION_EXPRESSION", "date_format(ts, 'yyyy-MM')").build()),
      StructField("dm", StringType, nullable = true,
        new MetadataBuilder() // month-first: NOT chronological-prefix
          .putString("GENERATION_EXPRESSION", "date_format(ts, 'MM-yyyy')").build())))
    val t0 = java.sql.Timestamp.valueOf("2024-03-05 10:30:00")
    val derived = GeneratedColumns.derive(
      Array(GreaterThanOrEqual("ts", t0)), schema, zone)
    assert(derived.toSet == Set[Filter](GreaterThanOrEqual("ym", "2024-03")),
      s"got ${derived.toSeq}")
    assert(GeneratedColumns.derive(
      Array(EqualTo("ts", t0)), schema, zone).toSet ==
      Set[Filter](EqualTo("ym", "2024-03")))
  }

  test("a timestamp filter prunes GENERATED day partitions: the scan " +
      "plans only matching directories without the query naming day") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.p (id BIGINT, ts TIMESTAMP, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
      "USING graft PARTITIONED BY (day) " +
      "OPTIONS (pk 'id', partitions '2', snapshot 'true')")
    (0 until 8).map(d => (d.toLong,
        java.sql.Timestamp.valueOf(f"2024-02-${d + 1}%02d 06:00:00")))
      .toDF("id", "ts").createOrReplaceTempView("gen_p_rows")
    spark.sql(s"INSERT INTO $cat.db.p (id, ts) SELECT id, ts FROM gen_p_rows")
    val dir = s"$base/db/p"
    val all = TokenPruner.listFiles(spark, dir)
    assert(all.map(f => TokenPruner.dirValues(f.path).get("day")).distinct.length == 8)
    // library-level: the derived conjunct prunes to ≤ 2 of 8 day dirs
    val schema = metaSchema(base, "p")
    val pushed: Array[Filter] = Array(
      GreaterThanOrEqual("ts", java.sql.Timestamp.valueOf("2024-02-07 00:00:00")))
    val derived = GeneratedColumns.derive(pushed, schema,
      ZoneId.of(spark.conf.get("spark.sql.session.timeZone")))
    val cql = graft.model.CqlSchema("p", Seq("id"))
    val kept = TokenPruner.prune(spark, all, pushed ++ derived, cql)
    assert(kept.length <= all.length / 4,
      s"derived pruning kept ${kept.length} of ${all.length}")
    // executed-plan level: the catalog scan itself plans the pruned set
    val q = spark.table(s"$cat.db.p")
      .filter(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-02-07 00:00:00")))
      .select(col("id"))
    val rows = q.as[Long].collect().toSet
    assert(rows == Set(6L, 7L))
    val scans = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    val planned = scans.head.metrics("graftFilesPlanned").value
    assert(planned <= all.length / 4,
      s"executed scan planned $planned of ${all.length}")
  }
}
