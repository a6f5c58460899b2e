package graft.token

import java.math.BigInteger
import java.nio.ByteBuffer

import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * RandomPartitioner token vectors (md5 abs-BigInteger, Cassandra
 * `RandomPartitioner`/`FBUtilities.hashToBigInteger` public semantics;
 * expected values computed independently with Python's hashlib) plus the
 * 16-byte binary encoding and ring-split invariants shared with Murmur3.
 */
class RandomTokenSpec extends AnyFunSuite {

  private def check(prop: org.scalacheck.Prop): Unit = {
    val res = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }

  private def beLong(v: Long) = ByteBuffer.allocate(8).putLong(v).array()

  test("token vectors match independently-computed md5 abs values") {
    assert(RandomToken.token(beLong(42L)) ==
      new BigInteger("167509774581059482115122350544966522260"))
    assert(RandomToken.token("hello".getBytes("UTF-8")) ==
      new BigInteger("123957004363873451094272536567338222994"))
    assert(RandomToken.token(Array.emptyByteArray) ==
      new BigInteger("58332598431525814501020785164969033090"))
    // composite (int 7, "a") through the shared CompositeType framing
    assert(RandomToken.tokenOf(Seq(Integer.valueOf(7), "a")) ==
      new BigInteger("88069084280011380123627568482731216768"))
  }

  test("tokens live in [0, 2^127] and bytes16 round-trips") {
    check(forAll { (key: Array[Byte]) =>
      val t = BigInt(RandomToken.token(key))
      t >= RandomToken.RingMin && t <= RandomToken.RingMax &&
        RandomToken.fromBytes16(RandomToken.tokenBytes16(t.bigInteger)) == t.bigInteger
    })
  }

  test("bytes16 unsigned-lexicographic order == numeric token order") {
    def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < 16) {
        val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      0
    }
    check(forAll { (k1: Array[Byte], k2: Array[Byte]) =>
      val (t1, t2) = (RandomToken.token(k1), RandomToken.token(k2))
      Integer.signum(unsignedCompare(
        RandomToken.tokenBytes16(t1), RandomToken.tokenBytes16(t2))) ==
        Integer.signum(t1.compareTo(t2))
    })
    // the extreme 2^127 (17-byte toByteArray with sign byte) encodes correctly
    val top = RandomToken.RingMax.bigInteger
    assert(RandomToken.fromBytes16(RandomToken.tokenBytes16(top)) == top)
  }

  test("random-ring splits share Murmur3's invariants: cover, no overlap, near-equal") {
    Seq(1, 3, 16, 257).foreach { n =>
      val splits = RandomToken.splits(n)
      assert(splits.length == n)
      assert(splits.head._1 == RandomToken.RingMin - 1)
      assert(splits.last._2 == RandomToken.RingMax)
      splits.sliding(2).foreach {
        case Seq((_, aEnd), (bStart, _)) => assert(aEnd == bStart)
        case _ =>
      }
      val widths = splits.map { case (a, b) => b - a }
      assert(widths.max - widths.min <= 1)
    }
  }
}
