package graft.functions

import graft.SparkSpec

/** safetensors header scanner + TFRecord framing: field fidelity, the
 *  restricted-grammar rejections, CRC gates, and the null contracts. */
class TensorShardSpec extends SparkSpec {

  // ---------------------------------------------------------- safetensors

  test("safetensors: names, dtypes, shapes, byte accounting, metadata skip") {
    val b = TensorShardCodec.safetensors(Seq(
      ("wq", "F32", Seq(64L, 128L)),
      ("bias", "F16", Seq(128L)),
      ("steps", "I64", Seq.empty)), withMetadata = true)
    val ts = SafetensorsHeaders.parse(b)
    assert(ts.map(_.name).toSeq == Seq("wq", "bias", "steps"))
    assert(ts.map(_.dtype).toSeq == Seq("F32", "F16", "I64"))
    assert(ts(0).shape.toSeq == Seq(64L, 128L) && ts(2).shape.isEmpty)
    // data_offsets are contiguous: 64*128*4, then 128*2, then 8
    assert(ts.map(t => t.end - t.begin).toSeq == Seq(32768L, 256L, 8L))
    assert(ts(1).begin == 32768L && ts(2).begin == 33024L)
  }

  test("safetensors: whitespace tolerated, foreign grammar rejected") {
    // np/hf writers sometimes pad the header with spaces before the data
    val spaced = "{ \"a\" : { \"dtype\" : \"U8\" , \"shape\" : [ 3 ] , " +
      "\"data_offsets\" : [ 0 , 3 ] } } "
    val jb = spaced.getBytes("UTF-8")
    val b = new Array[Byte](8 + jb.length + 3)
    var k = 0
    while (k < 8) { b(k) = ((jb.length.toLong >> (8 * k)) & 0xff).toByte; k += 1 }
    System.arraycopy(jb, 0, b, 8, jb.length)
    val ts = SafetensorsHeaders.parse(b)
    assert(ts.length == 1 && ts(0).name == "a" && ts(0).shape.toSeq == Seq(3L))
    // an unknown per-tensor key is outside the emitted grammar -> null
    val alien = spaced.replace("\"shape\"", "\"weird\"")
    val jb2 = alien.getBytes("UTF-8")
    val b2 = new Array[Byte](8 + jb2.length)
    k = 0
    while (k < 8) { b2(k) = ((jb2.length.toLong >> (8 * k)) & 0xff).toByte; k += 1 }
    System.arraycopy(jb2, 0, b2, 8, jb2.length)
    assert(SafetensorsHeaders.parse(b2) == null)
  }

  test("safetensors: \\uXXXX names decode, trailing garbage rejects, 0-dim exact") {
    def wrap(json: String, tail: Int = 0): Array[Byte] = {
      val jb = json.getBytes("UTF-8")
      val b = new Array[Byte](8 + jb.length + tail)
      var k = 0
      while (k < 8) { b(k) = ((jb.length.toLong >> (8 * k)) & 0xff).toByte; k += 1 }
      System.arraycopy(jb, 0, b, 8, jb.length)
      b
    }
    // python json.dumps default (ensure_ascii) escapes non-ASCII names:
    // the JSON carries backslash-u00e9, the parsed name carries é
    val uni = SafetensorsHeaders.parse(wrap(
      "{\"caf\\u00e9\":{\"dtype\":\"U8\",\"shape\":[2],\"data_offsets\":[0,2]}}", 2))
    assert(uni.length == 1 && uni(0).name == "café")
    // malformed \u -> null
    assert(SafetensorsHeaders.parse(wrap(
      "{\"a\\uzz11\":{\"dtype\":\"U8\",\"shape\":[1],\"data_offsets\":[0,1]}}", 1)) == null)
    // garbage after the closing brace inside the declared header -> null
    val okJson = """{"a":{"dtype":"U8","shape":[1],"data_offsets":[0,1]}}"""
    assert(SafetensorsHeaders.parse(wrap(okJson + "   ", 1)) != null) // space pad ok
    assert(SafetensorsHeaders.parse(wrap(okJson + "junk", 1)) == null)
    // a zero in the shape means zero elements and zero bytes, exactly
    val z = SafetensorsHeaders.parse(
      TensorShardCodec.safetensors(Seq(("t", "F32", Seq(0L, 4L)))))
    assert(z.length == 1)
    assert(z(0).end - z(0).begin == 0L)
  }

  test("safetensors corrupt bytes: null, never exceptions") {
    assert(SafetensorsHeaders.parse(null) == null)
    assert(SafetensorsHeaders.parse("way too short".getBytes) == null)
    val good = TensorShardCodec.safetensors(Seq(("t", "F32", Seq(2L, 2L))))
    for (cut <- 0 until good.length) SafetensorsHeaders.tensorsArray(good.take(cut))
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      SafetensorsHeaders.tensorsArray(b)
    }
  }

  // ------------------------------------------------------------- TFRecord

  test("TFRecord: offsets and sizes; length CRC gates the walk") {
    val p1 = Array.fill[Byte](37)(1)
    val p2 = Array.fill[Byte](5)(2)
    val p3 = Array.fill[Byte](200)(3)
    val b = TensorShardCodec.tfrecord(Seq(p1, p2, p3))
    val es = TfRecordHeaders.entries(b)
    assert(es.map(_._2).toSeq == Seq(37L, 5L, 200L))
    // record k payload at 12 + sum_{j<k}(16 + s_j)
    assert(es.map(_._1).toSeq == Seq(12L, 12L + 53, 12L + 53 + 21))
    // the payload at the offset is the payload
    assert(b(es(2)._1.toInt) == 3)
    // flipping a length-CRC byte of record 2 truncates the listing there
    val bad = b.clone()
    bad(53 + 8) = (bad(53 + 8) ^ 1).toByte
    assert(TfRecordHeaders.entries(bad).map(_._2).toSeq == Seq(37L))
    // a non-TFRecord blob is null (the first length CRC cannot match)
    assert(TfRecordHeaders.entries(Array.fill[Byte](64)(7)) == null)
    assert(TfRecordHeaders.entries(null) == null)
  }

  test("TFRecord: trailing bytes shorter than a record header refuse the listing") {
    val good = TensorShardCodec.tfrecord(Seq(
      Array.fill[Byte](10)(1), Array.fill[Byte](30)(2)))
    // a shard truncated MID-HEADER (1..15 trailing bytes) must not be
    // indistinguishable from a cleanly framed one
    for (extra <- 1 until 16)
      assert(TfRecordHeaders.entries(good ++ Array.fill[Byte](extra)(9)) == null,
        s"extra=$extra")
    // ...nor one cut MID-PAYLOAD: record 2's length CRC is intact but the
    // payload provably doesn't fit — refuse, don't list just record 1
    assert(TfRecordHeaders.entries(good.dropRight(10)) == null)
    // clean framing still lists both records
    assert(TfRecordHeaders.entries(good).length == 2)
  }

  test("tfrecord_member: payload extraction verifies the payload CRC") {
    val p0 = "first payload".getBytes
    val p1 = Array.tabulate[Byte](100)(i => (i * 3).toByte)
    val b = TensorShardCodec.tfrecord(Seq(p0, p1))
    assert(java.util.Arrays.equals(TfRecordHeaders.member(b, 0), p0))
    assert(java.util.Arrays.equals(TfRecordHeaders.member(b, 1), p1))
    assert(TfRecordHeaders.member(b, 2) == null)
    assert(TfRecordHeaders.member(b, -1) == null)
    // the inventory tolerates a corrupt PAYLOAD byte (length CRCs still
    // chain) but extraction of that record refuses it
    val bad = b.clone()
    bad(14) = (bad(14) ^ 1).toByte // inside record 0's payload
    assert(TfRecordHeaders.entries(bad).length == 2)
    assert(TfRecordHeaders.member(bad, 0) == null)
    assert(java.util.Arrays.equals(TfRecordHeaders.member(bad, 1), p1))
  }

  test("TFRecord truncation/bit-flip fuzz never throws") {
    val good = TensorShardCodec.tfrecord(Seq(
      Array.fill[Byte](10)(1), Array.fill[Byte](30)(2)))
    for (cut <- 0 until good.length) TfRecordHeaders.entriesArray(good.take(cut))
    val rnd = new scala.util.Random(32)
    for (_ <- 0 until 300) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      TfRecordHeaders.entriesArray(b)
    }
  }

  test("columns + SQL registration") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.registerAll(spark)
    val df = Seq((1L,
      TensorShardCodec.safetensors(Seq(("e", "I8", Seq(9L)))),
      TensorShardCodec.tfrecord(Seq("x".getBytes, "yz".getBytes))))
      .toDF("id", "st", "tfr")
    df.createOrReplaceTempView("shards_t")
    val viaSql = spark.sql(
      """SELECT size(safetensors_tensors(st)), size(tfrecord_entries(tfr))
        |FROM shards_t""".stripMargin).head
    assert(viaSql.getInt(0) == 1 && viaSql.getInt(1) == 2)
    val r = df.select(explode(SafetensorsExpr(col("st"))).as("t"))
      .select("t.name", "t.n_elems", "t.data_bytes").head
    assert(r.getString(0) == "e" && r.getLong(1) == 9 && r.getLong(2) == 9)
  }
}
