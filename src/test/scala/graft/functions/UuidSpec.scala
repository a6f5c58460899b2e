package graft.functions

import java.util.UUID

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CQL uuid/timeuuid comparison semantics (reference `CqlField.java:57`
 *  compares the string surface as java.util.UUID) and the counter/duration
 *  read rejections (`AbstractStreamScanner.java:84-91`). */
class UuidSpec extends SparkSpec {

  // deterministic fixture crossing every sign combination of msb/lsb, plus
  // version/variant nibble diversity and the extremes
  private val fixtures = Seq(
    "00000000-0000-0000-0000-000000000000",
    "ffffffff-ffff-ffff-ffff-ffffffffffff",
    "7fffffff-ffff-ffff-7fff-ffffffffffff",
    "80000000-0000-0000-8000-000000000000",
    "47183823-2574-4bfd-b411-99ed177d3e43",
    "f0000000-0000-4000-8000-000000000000",
    "00c0ffee-dead-1bad-cafe-0123456789ab",
    "fedcba98-7654-3210-0123-456789abcdef")

  test("msb/lsb reproduce java.util.UUID bit-exactly") {
    import spark.implicits._
    val rows = fixtures.toDF("u")
      .select(col("u"), Uuid.msb(col("u")).as("m"), Uuid.lsb(col("u")).as("l"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (s, m, l) =>
      val j = UUID.fromString(s)
      assert(m == j.getMostSignificantBits, s"msb of $s")
      assert(l == j.getLeastSignificantBits, s"lsb of $s")
    }
  }

  test("ordering by sortKey is UUID.compareTo order, not string order") {
    import spark.implicits._
    val sparkOrder = fixtures.toDF("u")
      .orderBy(Uuid.sortKey(col("u")))
      .as[String].collect().toSeq
    val javaOrder = fixtures.sortBy(UUID.fromString)(Ordering.comparatorToOrdering(
      java.util.Comparator.naturalOrder[UUID]()))
    assert(sparkOrder == javaOrder)
    // and the orders genuinely differ: lexicographic would put f0... last
    assert(sparkOrder != fixtures.sorted)
  }

  test("format builds a canonical uuid that java parses back to the md5 bits") {
    import spark.implicits._
    val u = Seq("hello").toDF("s")
      .select(Uuid.format(md5(col("s"))).as("u")).as[String].head()
    assert(UUID.fromString(u) != null)
    assert(u.replace("-", "") ==
      java.security.MessageDigest.getInstance("MD5").digest("hello".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("counter and duration columns are rejected on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_counter_").toString + "/t"
    import spark.implicits._
    val df = Seq((1L, 5L)).toDF("id", "cnt")
    graft.write.TokenSortedWriter.write(df, graft.model.CqlSchema("t", Seq("id")),
      dir, org.apache.spark.sql.SaveMode.Append,
      graft.write.TokenSortedWriter.WriteConf(numPartitions = 1))
    def read(types: String) =
      spark.read.format("graft").option("path", dir).option("pk", "id")
        .option("cqlTypes", types).load().collect()
    val e1 = intercept[UnsupportedOperationException](read("cnt:counter"))
    assert(e1.getMessage.contains("counter"))
    val e2 = intercept[UnsupportedOperationException](read("cnt:duration"))
    assert(e2.getMessage.contains("duration"))
    // non-rejected declarations pass through untouched
    assert(read("id:bigint,cnt:varint").length == 1)
  }

  test("counter and duration columns are rejected on write too") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_cw_").toString + "/t"
    val e = intercept[UnsupportedOperationException] {
      Seq((1L, 5L)).toDF("id", "cnt").write.format("graft")
        .option("path", out).option("pk", "id").option("cqlTypes", "cnt:counter")
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    }
    assert(e.getMessage.contains("counter"))
    // duration: the reference's Spark converter is a NotImplementedFeatures
    // stub (SparkDuration.java), so rejecting at write-resolve IS parity —
    // intentional, documented in SURVEY §2.9
    val ed = intercept[UnsupportedOperationException] {
      Seq((1L, 5L)).toDF("id", "cnt").write.format("graft")
        .option("path", out).option("pk", "id").option("cqlTypes", "cnt:duration")
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    }
    assert(ed.getMessage.contains("duration"))
    // the DSv2 write path (SQL INSERT INTO) must reject too, not just the
    // V1 createRelation path
    spark.sql("DROP TABLE IF EXISTS graft_counter_t")
    spark.sql(s"CREATE TABLE graft_counter_t USING graft OPTIONS " +
      s"(path '$out', pk 'id', cqlTypes 'cnt:counter')")
    try {
      val e2 = intercept[Exception] {
        spark.sql("INSERT INTO graft_counter_t VALUES (2, 7)")
      }
      def rootChain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: rootChain(t.getCause)
      assert(rootChain(e2).exists(m => m != null && m.contains("counter")), s"got $e2")
    } finally spark.sql("DROP TABLE IF EXISTS graft_counter_t")
  }
}
