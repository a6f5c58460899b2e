package graft.tables

import graft.SparkSpec
import graft.write.TokenSortedWriter
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Complex types (array/map/struct/nested array<struct>/decimal/date/
 *  timestamp) through the graft sink + DSv2 source: schema and values must
 *  survive the round-trip exactly (the EndToEndTests type-surface analog). */
class TypedTableSpec extends SparkSpec {
  import spark.implicits._

  private lazy val part = Seq(
    (1L, "large ring", "Brand#1", "ECONOMY", 7, 100.10),
    (7L, "hot bolt", "Brand#2", "SMALL", 14, 200.25), // pk % 7 == 0 → null note
    (9L, "blue plate", "Brand#3", "LARGE", 3, 999.99))
    .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")

  private lazy val (written, readBack) = {
    val typed = TypedTable.fromPart(part)
    val out = java.nio.file.Files.createTempDirectory("typed_spec_").toString + "/typed"
    TokenSortedWriter.write(typed, TypedTable.schema, out, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 2, keepTokenColumn = true))
    val rt = spark.read.format("graft").option("path", out).option("pk", "p_partkey").load()
    (typed, rt)
  }

  /** parquet stores every field optional, so compare types with nullability
   *  normalized — value-level null fidelity is asserted separately below */
  private def norm(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(norm(e))
    case MapType(k, v, _) => MapType(norm(k), norm(v))
    case StructType(fs) => StructType(fs.map(f => StructField(f.name, norm(f.dataType))))
    case other => other
  }

  test("complex schema is preserved exactly through sink + source") {
    val want = written.schema.fields.map(f => f.name -> norm(f.dataType)).toMap
    val got = readBack.schema.fields.map(f => f.name -> norm(f.dataType)).toMap
    assert(got == want)
    assert(got("tags") == ArrayType(StringType))
    assert(got("attrs") == MapType(StringType, LongType))
    assert(got("brand_info").asInstanceOf[StructType].fields.map(_.name).toSeq ==
      Seq("brand", "sz", "price"))
    assert(got("brand_info").asInstanceOf[StructType]("price").dataType == DecimalType(12, 2))
    assert(got("words") ==
      ArrayType(StructType(Seq(StructField("w", StringType), StructField("len", LongType)))))
    assert(got("d") == DateType && got("ts") == TimestampType)
    assert(got("bin") == BinaryType && got("small") == ShortType && got("tiny") == ByteType)
    assert(got("varint_ish") == DecimalType(38, 0))
  }

  test("binary/short/byte/varint-analog values round-trip exactly") {
    val r = readBack.filter($"p_partkey" === 1L).head()
    assert(new String(r.getAs[Array[Byte]]("bin"), "UTF-8") == "Brand#1")
    assert(r.getAs[Short]("small") == 7.toShort)
    assert(r.getAs[Byte]("tiny") == 7.toByte)
    assert(r.getAs[java.math.BigDecimal]("varint_ish") ==
      new java.math.BigDecimal("100100000"))
  }

  test("complex values round-trip exactly, including the null column") {
    val rows = readBack.orderBy("p_partkey").collect()
    val r1 = rows(0)
    assert(r1.getSeq[String](r1.fieldIndex("tags")) == Seq("large", "ring"))
    assert(r1.getMap[String, Long](r1.fieldIndex("attrs")) ==
      Map("size" -> 7L, "retail_cents" -> 10010L))
    val bi = r1.getStruct(r1.fieldIndex("brand_info"))
    assert(bi.getString(0) == "Brand#1" && bi.getInt(1) == 7)
    assert(bi.getDecimal(2) == new java.math.BigDecimal("100.10"))
    val words = rows(2).getSeq[org.apache.spark.sql.Row](rows(2).fieldIndex("words"))
    assert(words.map(w => (w.getString(0), w.getLong(1))) == Seq(("blue", 4L), ("plate", 5L)))
    assert(rows(1).isNullAt(rows(1).fieldIndex("note"))) // pk=7
    assert(rows(0).getString(rows(0).fieldIndex("note")) == "Brand#1")
  }

  test("set-as-array dedup survives: duplicates written, distinct read back") {
    val distinctTags = readBack.filter($"p_partkey" === 1L)
      .select(array_sort(array_distinct($"tag_set"))).as[Seq[String]].head()
    assert(distinctTags == Seq("ECONOMY", "large", "ring"))
    val raw = readBack.filter($"p_partkey" === 1L)
      .select(size($"tag_set")).as[Int].head()
    assert(raw == 5) // duplicates genuinely stored
  }
}
