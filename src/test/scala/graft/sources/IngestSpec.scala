package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ing_$name").toString

  test("jsonl round-trips content with quotes, unicode, embedded newlines") {
    val rows = Seq(
      (1L, "plain text"),
      (2L, "quotes \" and \\ backslash"),
      (3L, "line one\nline two"), // newline survives as \n escape in JSONL
      (4L, "unicodé ✓"))
    val dir = tmp("json") + "/data"
    rows.toDF("id", "text").write.json(dir)
    val back = Ingest.jsonl(spark, dir, schema)
      .as[(Long, String)].collect().toSet
    assert(back === rows.toSet)
  }

  test("jsonl FAILFAST aborts on a corrupt line; permissive quarantines it") {
    val dir = tmp("bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.json"),
      """{"id": 1, "text": "ok"}
        |not json at all
        |{"id": 2, "text": "also ok"}""".stripMargin)
    val e = intercept[Exception] {
      Ingest.jsonl(spark, dir, schema).collect()
    }
    def chain(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c => c.getClass.getName.contains("Malformed") ||
      String.valueOf(c.getMessage).contains("Malformed")))
    // Spark disallows selecting ONLY _corrupt_record from raw files;
    // materialize the parse first (the documented quarantine recipe)
    val perm = Ingest.jsonlPermissive(spark, dir, schema).cache()
    val rejects = perm.filter($"_corrupt_record".isNotNull)
      .select("_corrupt_record").as[String].collect()
    assert(rejects.toSeq === Seq("not json at all"))
    assert(perm.filter($"_corrupt_record".isNull).count() === 2)
  }

  test("csv round-trips quoted fields with delimiters and quotes inside") {
    val rows = Seq((1L, "a,b with, commas"), (2L, "say \"hi\" now"))
    val dir = tmp("csv") + "/data"
    rows.toDF("id", "text").write.option("header", true).csv(dir)
    val back = Ingest.csv(spark, dir, schema)
      .as[(Long, String)].collect().toSet
    assert(back === rows.toSet)
  }

  test("csv honors a custom delimiter; fields containing it still round-trip") {
    val rows = Seq((1L, "tab\there and unicodé ✓"), (2L, "comma, is plain under tabs"))
    val dir = tmp("tsv") + "/data"
    rows.toDF("id", "text").write
      .option("header", true).option("sep", "\t").csv(dir)
    val back = Ingest.csv(spark, dir, schema, delimiter = "\t")
      .as[(Long, String)].collect().toSet
    assert(back === rows.toSet)
  }

  test("csv FAILFAST aborts on a malformed row; permissive quarantines it") {
    val dir = tmp("badcsv")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.csv"),
      "id,text\n1,ok\nnot_a_long,broken\n2,also ok\n")
    val e = intercept[Exception] {
      Ingest.csv(spark, dir, schema).collect()
    }
    def chain(t: Throwable) =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c => c.getClass.getName.contains("Malformed") ||
      (c.getMessage != null && c.getMessage.contains("FAILFAST"))))
    val parsed = Ingest.csvPermissive(spark, dir, schema).cache()
    val bad = parsed.filter("_corrupt_record IS NOT NULL")
    assert(bad.count() === 1)
    assert(parsed.filter("_corrupt_record IS NULL").count() === 2)
    parsed.unpersist()
  }

  test("orc round-trips exactly; pinned schema null-fills a missing column") {
    val dir = tmp("orc") + "/t"
    val rows = Seq((1L, "héllo \"q\" ,;\t"), (2L, null), (3L, "plain"))
    Ingest.writeOrc(rows.toDF("id", "text"), dir)
    val back = Ingest.orc(spark, dir, schema)
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(back == rows.map { case (i, t) => (i, Option(t)) })
    // schema pinning: asking for a column the files lack nulls it in
    // (day-over-day appends where the schema grew)
    val widened = schema.add(StructField("extra", LongType))
    val w = Ingest.orc(spark, dir, widened)
      .as[(Long, Option[String], Option[Long])].collect()
    assert(w.length == 3 && w.forall(_._3.isEmpty))
  }
}
