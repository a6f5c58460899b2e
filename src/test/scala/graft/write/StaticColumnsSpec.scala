package graft.write

import graft.SparkSpec
import graft.model.CqlSchema
import graft.operators.Normalize
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Static-column semantics: one value per PARTITION, owned by the highest
 *  writetime across ALL row versions in the partition, replicated onto every
 *  row (reference SparkCellIterator.java:282-287; SURVEY §7.4 hard part). */
class StaticColumnsSpec extends SparkSpec {
  import spark.implicits._

  test("propagateStatics picks the latest non-null static across sibling rows") {
    // partition 1: static written on row A @10, row B updated @20 w/o static
    // partition 2: two statics, higher writetime wins
    // partition 3: no static anywhere -> null
    val df = Seq(
      (1L, "A", Some("s1"), 10L),
      (1L, "B", None, 20L),
      (2L, "A", Some("old"), 5L),
      (2L, "B", Some("new"), 7L),
      (3L, "A", None, 1L))
      .toDF("pk", "ck", "st", "wt")
    val out = Normalize.propagateStatics(df, Seq("pk"), Seq("st"), "wt")
      .select("pk", "ck", "st").as[(Long, String, Option[String])].collect().toSet
    assert(out == Set(
      (1L, "A", Some("s1")), (1L, "B", Some("s1")),
      (2L, "A", Some("new")), (2L, "B", Some("new")),
      (3L, "A", None)))
  }

  test("equal writetimes tie-break on the greater value (Cassandra rule)") {
    val df = Seq((1L, "A", Some("zzz"), 10L), (1L, "B", Some("aaa"), 10L))
      .toDF("pk", "ck", "st", "wt")
    val out = Normalize.propagateStatics(df, Seq("pk"), Seq("st"), "wt")
      .select("st").as[String].collect().toSet
    assert(out == Set("zzz"))
  }

  test("readNormalized replicates a static from an older version onto LWW winners") {
    val schema = CqlSchema("t", Seq("pk"), Seq("ck"), Seq("st"))
    val out = java.nio.file.Files.createTempDirectory("static_spec_").toString + "/t"
    // v1: rows (1,A v=1) (1,B v=2) with no static
    TokenSortedWriter.write(
      Seq((1L, "A", 1L, null.asInstanceOf[String]), (1L, "B", 2L, null.asInstanceOf[String]))
        .toDF("pk", "ck", "v", "st"),
      schema, out, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = true,
        writetimeMicros = Some(100L)))
    // v2: static arrives on row A only
    TokenSortedWriter.write(
      Seq((1L, "A", 1L, "note")).toDF("pk", "ck", "v", "st"),
      schema, out, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = true,
        writetimeMicros = Some(200L)))
    // v3: row A gets a NEWER version without the static
    TokenSortedWriter.write(
      Seq((1L, "A", 10L, null.asInstanceOf[String])).toDF("pk", "ck", "v", "st"),
      schema, out, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = true,
        writetimeMicros = Some(300L)))
    val got = TokenSortedWriter.readNormalized(spark, schema, out)
      .select("pk", "ck", "v", "st").as[(Long, String, Long, String)].collect().toSet
    // row A's value is the @300 version, but the @200 static survives on BOTH rows
    assert(got == Set((1L, "A", 10L, "note"), (1L, "B", 2L, "note")))
  }
}
