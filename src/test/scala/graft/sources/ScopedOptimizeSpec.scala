package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.write.Snapshots
import org.apache.spark.sql.functions._

/** Predicate-scoped OPTIMIZE (`CALL cat.system.optimize(predicate =>
 *  '…')`): only files that may hold matching rows pack; everything else
 *  is untouched; unsupported predicates refuse loudly. */
class ScopedOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog(): (String, String) = {
    val cat = "gsop" + java.util.UUID.randomUUID().toString.take(8)
    val base = Files.createTempDirectory("graft_sopspec_").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    (cat, base)
  }

  private def filesByDir(dir: String): Map[Option[String], Int] =
    TokenPruner.listFiles(spark, dir)
      .groupBy(f => TokenPruner.dirValues(f.path).get("p").flatten)
      .map { case (k, v) => k -> v.length }

  test("predicate scopes packing to matching directories; others are " +
      "untouched; the commit is layout-only and rows are unchanged") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, p STRING, v BIGINT) " +
      "USING graft PARTITIONED BY (p) " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    // two waves → 2 small files per dir
    (0 until 2).foreach { w =>
      spark.sql(s"INSERT INTO $cat.db.t SELECT id + ${w * 100}, " +
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END, id FROM RANGE(40) AS r(id)")
    }
    val dir = s"$base/db/t"
    val before = filesByDir(dir)
    assert(before(Some("a")) >= 2 && before(Some("b")) >= 2)
    val rowsBefore = spark.table(s"$cat.db.t").collect().toSet

    val packed = spark.sql(
      s"CALL $cat.system.optimize(table => 'db.t', predicate => \"p = 'a'\")")
      .collect().head.getLong(0)
    assert(packed >= 2, s"expected dir a's files to pack, packed=$packed")

    val head = Snapshots.latestVersion(spark, dir).get
    val after = Snapshots.files(spark, dir, head)
      .groupBy(f => TokenPruner.dirValues(f).get("p").flatten)
      .map { case (k, v) => k -> v.length }
    assert(after(Some("a")) == 1, s"dir a must be packed to one file: $after")
    assert(after(Some("b")) == before(Some("b")), "dir b must be untouched")
    assert(spark.table(s"$cat.db.t").collect().toSet == rowsBefore)
  }

  test("an unsupported predicate refuses loudly instead of silently " +
      "widening the scope") {
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.u (id BIGINT, v BIGINT) " +
      "USING graft OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    spark.sql(s"INSERT INTO $cat.db.u VALUES (1, 1)")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.optimize(table => 'db.u', " +
        "predicate => 'v + id = 2')")
    }
    def chain(t: Throwable): List[Throwable] =
      t :: Option(t.getCause).map(chain).getOrElse(Nil)
    assert(chain(e).exists(t => Option(t.getMessage)
      .exists(_.contains("unsupported conjunct"))), s"got $e")
  }

  test("generated-column inference scopes a timestamp predicate onto the " +
      "generated day layout") {
    val (cat, base) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.db.g (id BIGINT, ts TIMESTAMP, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
      "USING graft PARTITIONED BY (day) " +
      "OPTIONS (pk 'id', partitions '1', snapshot 'true')")
    (0 until 2).foreach { w =>
      (0 until 4).map(d => (w * 10L + d,
          java.sql.Timestamp.valueOf(f"2024-03-0${d + 1} 08:00:00")))
        .toDF("id", "ts").createOrReplaceTempView("sop_rows")
      spark.sql(s"INSERT INTO $cat.db.g (id, ts) SELECT id, ts FROM sop_rows")
    }
    val dir = s"$base/db/g"
    spark.sql(s"CALL $cat.system.optimize(table => 'db.g', " +
      "predicate => \"ts >= TIMESTAMP'2024-03-04 00:00:00'\")")
    val head = Snapshots.latestVersion(spark, dir).get
    val after = Snapshots.files(spark, dir, head)
      .groupBy(f => TokenPruner.dirValues(f).get("day").flatten)
      .map { case (k, v) => k -> v.length }
    assert(after(Some("2024-03-04")) == 1,
      s"the matching day dir must pack: $after")
    assert(after(Some("2024-03-01")) == 2,
      s"non-matching day dirs must be untouched: $after")
  }
}
