package graft.functions

import graft.SparkSpec
import graft.token.Murmur3Token
import org.apache.spark.sql.functions._

/** `graft_token` over CQL-typed partition keys: Spark's internal temporal
 *  encodings (epoch micros / day counts) must be re-encoded to Cassandra's
 *  marshal forms (8-byte BE millis / centered unsigned days) before hashing,
 *  and UUID strings route through `uuid_bin`. Each case is checked against
 *  the token of the explicitly-serialized bytes (binary components hash
 *  as-is), in both codegen and interpreted paths implicitly via the plan. */
class CqlTypedTokenSpec extends SparkSpec {

  import spark.implicits._

  test("timestamp pk hashes CQL epoch-millis bytes, not Spark micros") {
    val df = Seq("2024-03-01 12:34:56.789").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    val got = df.select(graft_token(col("ts"))).head().getLong(0)
    val millis = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789").getTime
    assert(got == Murmur3Token.token(Murmur3Token.serializeMillis(millis)))
    // and NOT the naive micros-as-bigint hash
    assert(got != Murmur3Token.token(Murmur3Token.serializeComponent(Long.box(millis * 1000L))))
  }

  test("date pk hashes CQL centered-days bytes") {
    val df = Seq("1970-01-02").toDF("s").select(to_date(col("s")).as("d"))
    val got = df.select(graft_token(col("d"))).head().getLong(0)
    assert(got == Murmur3Token.token(Murmur3Token.serializeDays(1)))
  }

  test("uuid_bin produces UUIDType bytes; token matches the UUID's ring token") {
    val u = "00112233-4455-6677-8899-aabbccddeeff"
    val df = Seq(u).toDF("u")
    val bytes = df.select(uuid_bin(col("u"))).head().getAs[Array[Byte]](0)
    assert(bytes.length == 16)
    assert(df.select(graft_token(uuid_bin(col("u")))).head().getLong(0) ==
      Murmur3Token.tokenOf(Seq(java.util.UUID.fromString(u))))
  }

  test("composite (timestamp, long) key frames the re-encoded component") {
    val df = Seq(("2024-03-01 00:00:00", 7L)).toDF("s", "k")
      .select(to_timestamp(col("s")).as("ts"), col("k"))
    val got = df.select(graft_token(col("ts"), col("k"))).head().getLong(0)
    val millis = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    assert(got == Murmur3Token.tokenOf(Seq(Murmur3Token.serializeMillis(millis), Long.box(7L))))
  }

  test("null temporal component hashes as the empty buffer (CQL null)") {
    val df = Seq(1).toDF("x")
      .select(lit(null).cast("timestamp").as("ts"), col("x").cast("long").as("k"))
    val got = df.select(graft_token(col("ts"), col("k"))).head().getLong(0)
    assert(got == Murmur3Token.tokenOf(Seq(null, Long.box(1L))))
  }
}
