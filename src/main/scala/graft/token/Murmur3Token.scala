package graft.token

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Cassandra-compatible Murmur3 token: the x64 128-bit MurmurHash3 (public
 * domain algorithm by Austin Appleby, re-implemented here from the published
 * reference spec), seed 0, keeping the first 64-bit half, with
 * `Long.MinValue` normalized to `Long.MaxValue` — exactly the token a
 * Cassandra `Murmur3Partitioner` assigns to a partition-key buffer
 * (reference behavior: `cassandra-analytics-common` `utils/MurmurHash.java`
 * + `data/partitioner/Partitioner.java:37-63`; SURVEY §7.4 flags that Spark's
 * builtin `hash()`/`xxhash64()` are NOT bit-compatible, hence this port).
 *
 * Scale note: pure per-row CPU, no allocation beyond the key buffer; used
 * inside a Catalyst expression (see [[graft.functions.CassandraToken]]) so
 * token assignment is distributed and never driver-side.
 */
object Murmur3Token {

  @inline private def rotl64(v: Long, n: Int): Long = (v << n) | (v >>> (64 - n))

  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  private val C1 = 0x87c37b91114253d5L
  private val C2 = 0x4cf5ad432745937fL

  /** MurmurHash3 x64 128-bit over `data[offset, offset+length)`; returns the
   *  two 64-bit halves. Matches Cassandra's block-reading variant, which
   *  reads trailing bytes as SIGNED values (a deliberate quirk of the
   *  original Java port that the token ring inherited). */
  def hash128(data: Array[Byte], offset: Int, length: Int, seed: Long): (Long, Long) = {
    val nblocks = length >> 4
    var h1 = seed
    var h2 = seed

    var i = 0
    while (i < nblocks) {
      val base = offset + (i << 4)
      var k1 = getLongLE(data, base)
      var k2 = getLongLE(data, base + 8)

      k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    // tail — signed byte reads, per the Cassandra/Guava Java lineage
    val tail = offset + (nblocks << 4)
    var k1 = 0L
    var k2 = 0L
    val rem = length & 15
    if (rem >= 15) k2 ^= data(tail + 14).toLong << 48
    if (rem >= 14) k2 ^= data(tail + 13).toLong << 40
    if (rem >= 13) k2 ^= data(tail + 12).toLong << 32
    if (rem >= 12) k2 ^= data(tail + 11).toLong << 24
    if (rem >= 11) k2 ^= data(tail + 10).toLong << 16
    if (rem >= 10) k2 ^= data(tail + 9).toLong << 8
    if (rem >= 9) k2 ^= data(tail + 8).toLong
    if (rem >= 9) { k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2 }
    if (rem >= 8) k1 ^= data(tail + 7).toLong << 56
    if (rem >= 7) k1 ^= data(tail + 6).toLong << 48
    if (rem >= 6) k1 ^= data(tail + 5).toLong << 40
    if (rem >= 5) k1 ^= data(tail + 4).toLong << 32
    if (rem >= 4) k1 ^= data(tail + 3).toLong << 24
    if (rem >= 3) k1 ^= data(tail + 2).toLong << 16
    if (rem >= 2) k1 ^= data(tail + 1).toLong << 8
    if (rem >= 1) { k1 ^= data(tail).toLong; k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1 }

    h1 ^= length.toLong
    h2 ^= length.toLong
    h1 += h2
    h2 += h1
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 += h2
    h2 += h1
    (h1, h2)
  }

  @inline private def getLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  /** Token of a serialized partition-key buffer (Murmur3Partitioner
   *  semantics: first hash half, MinValue normalized to MaxValue). */
  def token(keyBytes: Array[Byte]): Long = {
    val h = hash128(keyBytes, 0, keyBytes.length, 0L)._1
    if (h == Long.MinValue) Long.MaxValue else h
  }

  // ---- CQL-style key serialization ------------------------------------

  /** Serialize one partition-key component to its CQL binary form (the same
   *  fixed-width big-endian / UTF-8 forms Cassandra hashes). Temporal and
   *  UUID values use Cassandra's marshal encodings (public formats:
   *  `TimestampType` = 8-byte BE epoch millis, `SimpleDateType` = 4-byte BE
   *  unsigned days centered at 2^31, `UUIDType` = 16 bytes MSB-then-LSB). */
  def serializeComponent(v: Any): Array[Byte] = v match {
    case null => Array.emptyByteArray
    case b: Array[Byte] => b
    case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    case s: org.apache.spark.unsafe.types.UTF8String => s.getBytes
    case i: java.lang.Integer => ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(i).array()
    case l: java.lang.Long => ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(l).array()
    case s: java.lang.Short => ByteBuffer.allocate(2).order(ByteOrder.BIG_ENDIAN).putShort(s).array()
    case b: java.lang.Byte => Array(b.byteValue())
    case b: java.lang.Boolean => Array[Byte](if (b) 1 else 0)
    case f: java.lang.Float => ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putFloat(f).array()
    case d: java.lang.Double => ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(d).array()
    case t: java.sql.Timestamp => serializeMillis(t.getTime)
    case i: java.time.Instant => serializeMillis(i.toEpochMilli)
    case d: java.sql.Date => serializeDays(d.toLocalDate.toEpochDay.toInt)
    case d: java.time.LocalDate => serializeDays(d.toEpochDay.toInt)
    case u: java.util.UUID =>
      ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
        .putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits).array()
    case other => other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** CQL `timestamp`: epoch millis as 8-byte BE. */
  def serializeMillis(millis: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(millis).array()

  /** CQL `date`: unsigned 32-bit days centered at 2^31 (epoch day 0 →
   *  0x80000000) — i.e. the sign bit of the signed day count flipped. */
  def serializeDays(days: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(days ^ Int.MinValue).array()

  /** Serialize a full partition key. A single component hashes its raw CQL
   *  bytes; a composite key uses Cassandra's CompositeType framing — per
   *  component: u16 big-endian length, the bytes, then a 0x00 end-of-component
   *  marker (reference: `utils/ByteBufferUtils` composite split/extract). */
  def serializeKey(components: Seq[Any]): Array[Byte] = {
    if (components.lengthCompare(1) == 0) return serializeComponent(components.head)
    val parts = components.map(serializeComponent)
    val buf = ByteBuffer.allocate(parts.map(_.length + 3).sum).order(ByteOrder.BIG_ENDIAN)
    parts.foreach { p =>
      buf.putShort(p.length.toShort)
      buf.put(p)
      buf.put(0.toByte)
    }
    buf.array()
  }

  def tokenOf(components: Seq[Any]): Long = token(serializeKey(components))
}
