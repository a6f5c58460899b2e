package graft.token

import java.math.BigInteger
import java.security.MessageDigest

/**
 * Cassandra RandomPartitioner token: `abs(new BigInteger(md5(key)))` over the
 * ring `[0, 2^127]` — the second partitioner the reference supports next to
 * Murmur3 (reference: `cassandra-four-zero-types/.../CassandraTypesImplementation.java`
 * exposes both; integration test `RandomPartitionerTest`; the md5/abs
 * semantics are Cassandra's public `RandomPartitioner`/`FBUtilities
 * .hashToBigInteger` behavior).
 *
 * Shared machinery: partition-key serialization (CQL marshal encodings +
 * CompositeType framing) comes from [[Murmur3Token.serializeKey]]; ring
 * split arithmetic from [[TokenRanges.splitRingBig]]. Only the hash and the
 * token domain differ.
 *
 * Spark surface: a 127-bit token fits neither LongType nor Decimal(38) —
 * tokens travel as FIXED-WIDTH 16-byte big-endian binary
 * ([[tokenBytes16]]), whose unsigned-lexicographic BinaryType ordering
 * equals numeric token ordering, so `repartitionByRange` /
 * `sortWithinPartitions` on the token column behave exactly as on the
 * Murmur3 long.
 */
object RandomToken {

  val RingMin: BigInt = BigInt(0)
  /** `abs` of a signed 128-bit value can reach 2^127 itself. */
  val RingMax: BigInt = BigInt(1) << 127

  // per-row hot path of a random-ring bulk write: cache the digest per
  // thread (Cassandra does the same, FBUtilities.threadLocalMD5Digest)
  // instead of a JCA provider lookup + allocation per row
  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  def token(keyBytes: Array[Byte]): BigInteger = {
    val d = md5.get()
    d.reset()
    new BigInteger(d.digest(keyBytes)).abs()
  }

  def tokenOf(components: Seq[Any]): BigInteger =
    token(Murmur3Token.serializeKey(components))

  /** Fixed-width 16-byte big-endian unsigned form, zero-padded. The one
   *  17-byte `toByteArray` case (a leading sign byte, e.g. for 2^127) drops
   *  the redundant leading 0x00. */
  def tokenBytes16(t: BigInteger): Array[Byte] = {
    val raw = t.toByteArray
    val out = new Array[Byte](16)
    val srcOff = math.max(0, raw.length - 16)
    System.arraycopy(raw, srcOff, out, 16 - (raw.length - srcOff), raw.length - srcOff)
    out
  }

  /** Numeric value back from the 16-byte form (diagnostics/tests). */
  def fromBytes16(b: Array[Byte]): BigInteger = new BigInteger(1, b)

  /** Near-equal ring splits over the random domain — the same bounds
   *  arithmetic Murmur3's `splitRing` uses. */
  def splits(n: Int): IndexedSeq[(BigInt, BigInt)] =
    TokenRanges.splitRingBig(n, RingMin, RingMax)
}
