package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    (1L, 100L, "t1"), (1L, 200L, "t2"), (1L, 300L, "t3"),
    (2L, 150L, "t4"),
    (3L, 50L, "t5")) // key 3 has no quote at all
    .toDF("k", "trade_ts", "trade_id")

  private lazy val quotes = Seq(
    (1L, 90L, 1.0), (1L, 200L, 2.0), (1L, 250L, 3.0),
    (2L, 160L, 9.9)) // only AFTER key 2's trade
    .toDF("k", "quote_ts", "px")

  test("backward as-of picks the latest right row at or before each left ts") {
    val out = AsOf.joinBackward(trades, quotes, Seq("k"), "trade_ts", "quote_ts")
      .select("trade_id", "px").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t1") == Some(1.0)) // 90 <= 100
    assert(out("t2") == Some(2.0)) // tie: quote AT 200 matches
    assert(out("t3") == Some(3.0)) // 250 <= 300
    assert(out("t4") == None)      // quote only at 160 > 150
    assert(out("t5") == None)      // no quotes for key
  }

  test("as-of join plans a single shuffle (one key exchange, no join node)") {
    val out = AsOf.joinBackward(trades, quotes, Seq("k"), "trade_ts", "quote_ts")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join node:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one key shuffle:\n$plan")
  }

  test("interval join pairs points with covering intervals, bucket-width independent") {
    val pts = Seq((1L, 105L, "p1"), (1L, 260L, "p2"), (2L, 10L, "p3"))
      .toDF("k", "t", "pid")
    val ivs = Seq((1L, 100L, 110L, "i1"), (1L, 100L, 300L, "i2"), (1L, 261L, 280L, "i3"),
      (2L, 20L, 30L, "i4"))
      .toDF("k", "s", "e", "iid")
    def run(bw: Long) = AsOf.intervalJoin(pts, ivs, Seq("k"), "t", "s", "e", bw)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val expected = Seq(("p1", "i1"), ("p1", "i2"), ("p2", "i2"))
    assert(run(50L) == expected)
    assert(run(7L) == expected)    // results identical across bucket widths
    assert(run(1000L) == expected)
  }

  test("null right-payload fields are NOT backfilled from older right rows") {
    // quote at 200 has px=null: t2/t3-era trades must see (px=null, venue=B)
    // as one row, not px stitched in from the older quote at 90
    val q = Seq(
      (1L, 90L, Some(1.0), "A"),
      (1L, 200L, None: Option[Double], "B"))
      .toDF("k", "quote_ts", "px", "venue")
    val out = AsOf.joinBackward(trades.filter($"k" === 1), q, Seq("k"), "trade_ts", "quote_ts")
      .select("trade_id", "px", "venue").collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), r.getString(2))).toMap
    assert(out("t1") == (Some(1.0), "A"))
    assert(out("t2") == (None, "B")) // the matched row's own null, venue from same row
    assert(out("t3") == (None, "B"))
  }

  test("column collisions are rejected") {
    val e = intercept[IllegalArgumentException] {
      AsOf.joinBackward(trades, trades, Seq("k"), "trade_ts", "trade_ts")
    }
    assert(e.getMessage.contains("rename colliding"))
  }
}
