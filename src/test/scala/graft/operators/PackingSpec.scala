package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("assignBins: hand-checked boundaries in one shard") {
    // sizes 60,60,60 with budget 100: prefix-before = 0,60,120 → bins 0,0,1
    val df = Seq((1L, 60L), (2L, 60L), (3L, 60L)).toDF("id", "sz")
    val bins = Packing.assignBins(df, Seq.empty, Seq("id"), "sz", 100L)
      .orderBy("id").select("bin").as[Long].collect().toSeq
    assert(bins == Seq(0L, 0L, 1L))
  }

  test("oversized document takes bins alone; packing resumes after") {
    // 10, 250, 10 with budget 100: prefix 0,10,260 → bins 0, 0, 2
    val df = Seq((1L, 10L), (2L, 250L), (3L, 10L)).toDF("id", "sz")
    val bins = Packing.assignBins(df, Seq.empty, Seq("id"), "sz", 100L)
      .orderBy("id").select("bin").as[Long].collect().toSeq
    assert(bins == Seq(0L, 0L, 2L))
  }

  test("bins are contiguous per shard and fills respect the budget shape") {
    val df = (1L to 1000L).map(i => (i, i % 5, 50L + (i % 7) * 10)).toDF("id", "shard", "sz")
    val stats = Packing.binStats(df, Seq("shard"), Seq("id"), "sz", 400L)
    // every bin except possibly the last per shard must reach the budget
    // once its first overflowing doc lands: fill + largest-next >= budget is
    // hard to assert directly; assert the simple invariants instead
    val rows = stats.collect()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum == 1000L)
    // bin ids per shard form 0..max with no gaps
    val byShard = stats.select("shard", "bin").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq)
    byShard.foreach { case (_, bins) => assert(bins == (0L to bins.max).toSeq) }
    // no single-doc bin is below budget unless it follows an overflow:
    // weaker invariant — every fill is positive and largest <= fill
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("fill")) >= r.getLong(r.fieldIndex("largest")))
    }
  }

  test("deterministic under repartitioning (shuffle-order independence)") {
    val df = (1L to 500L).map(i => (i, i % 3, 30L + i % 11)).toDF("id", "shard", "sz")
    val a = Packing.assignBins(df, Seq("shard"), Seq("id"), "sz", 200L)
    val b = Packing.assignBins(df.repartition(13), Seq("shard"), Seq("id"), "sz", 200L)
    assert(a.select("id", "bin").except(b.select("id", "bin")).count() == 0)
  }
}
