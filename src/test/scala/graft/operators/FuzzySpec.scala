package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {

  import spark.implicits._

  private lazy val names = Seq(
    (1L, "golden lace spring"),
    (2L, "golden lace sprint"),   // dist 1 from #1
    (3L, "golden lace sprinting"),
    (4L, "silver mist autumn"),
    (5L, "silver mist autumM")    // dist 1 from #4
  ).toDF("id", "name")

  test("finds pairs within maxDist inside a block") {
    val pairs = Fuzzy.selfJoinByEditDistance(names, "id", "name", maxDist = 1, blockPrefix = 6)
      .select("a_id", "b_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 1), (4L, 5L, 1)))
    // (2,3) differ by 3 edits; (1,3) by 4 — excluded by the length band + distance
  }

  test("blockPrefix 0 degrades to the exact all-pairs join") {
    val exact = Fuzzy.selfJoinByEditDistance(names, "id", "name", maxDist = 3, blockPrefix = 0)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((2L, 3L))) // "sprint" → "sprinting" = 3 inserts
    assert(!exact.contains((1L, 4L)))
  }

  test("prefix blocking trades recall exactly as documented") {
    val diffPrefix = Seq((1L, "abcdef"), (2L, "Abcdef")).toDF("id", "name")
    val blocked = Fuzzy.selfJoinByEditDistance(diffPrefix, "id", "name", 1, blockPrefix = 3)
    assert(blocked.count() == 0, "edit inside the blocking prefix is missed by design")
    val unblocked = Fuzzy.selfJoinByEditDistance(diffPrefix, "id", "name", 1, blockPrefix = 0)
    assert(unblocked.count() == 1)
  }

  test("pairs are emitted once with a_id < b_id") {
    val pairs = Fuzzy.selfJoinByEditDistance(names, "id", "name", 1, 6).collect()
    assert(pairs.forall(r => r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }
}
