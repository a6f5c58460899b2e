package graft

import java.nio.file.Files

import graft.model.CqlSchema
import graft.write.TokenSortedWriter
import org.apache.spark.sql.SaveMode

/** `Graft.toJsonDump` — the `sstableToJson` debug-dump analog (reference
  * `CassandraBridge.java:421`): rows + ring token as flat JSON documents. */
class JsonDumpSpec extends SparkSpec {

  private val schema = CqlSchema("t", Seq("id"))

  test("dump carries the on-disk token when kept, recomputes it when dropped") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

    val kept = Files.createTempDirectory("graft_jd1_").toString + "/t"
    TokenSortedWriter.write(df, schema, kept, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = true))
    val dropped = Files.createTempDirectory("graft_jd2_").toString + "/t"
    TokenSortedWriter.write(df, schema, dropped, SaveMode.Append,
      TokenSortedWriter.WriteConf(numPartitions = 1, keepTokenColumn = false))

    def parse(dir: String): Map[Long, (Long, String)] =
      Graft.toJsonDump(spark, schema, dir).collect().map { js =>
        val id = "\"id\":(-?\\d+)".r.findFirstMatchIn(js).get.group(1).toLong
        val tok = "\"_graft_token\":(-?\\d+)".r.findFirstMatchIn(js).get.group(1).toLong
        val v = "\"v\":\"(\\w+)\"".r.findFirstMatchIn(js).get.group(1)
        id -> (tok, v)
      }.toMap

    val a = parse(kept)
    val b = parse(dropped)
    assert(a.keySet == Set(1L, 2L, 3L) && a == b,
      "recomputed tokens must equal the on-disk tokens, rows intact")
    assert(a(1L)._2 == "a" && a(3L)._2 == "c")
    // the token leads each document (reference dump shape: partition header first)
    val first = Graft.toJsonDump(spark, schema, kept).first()
    assert(first.startsWith("{\"_graft_token\":"), first)
  }
}
