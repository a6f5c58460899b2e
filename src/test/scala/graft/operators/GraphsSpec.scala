package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("a hub every vertex links to ranks first; reruns are bit-identical") {
    // vertices 1..9 all link to 0; 0 links back to 1 only
    val edges = ((1L to 9L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val got = Graphs.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byRank = got.sortBy(_._3)
    assert(byRank.head._1 == 0L, s"hub must rank 1, got ${byRank.head}")
    assert(byRank(1)._1 == 1L, "the hub's sole target ranks second")
    val again = Graphs.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("multi-edges weigh: a double link beats a single link") {
    // 1 links twice to 2 and once to 3; (plus a back-edge so no dangling)
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val pr = Graphs.pageRank(edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(2L) > pr(3L), s"double-linked 2 must outrank 3: $pr")
  }

  test("dangling vertices keep the base mass and never crash") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // 3 dangles
    val got = Graphs.pageRank(edges, "src", "dst", iters = 2)
    assert(got.count() == 3L)
    assert(got.filter(col("vertex") === 3L).count() == 1L)
  }

  test("distributed rank is the exact global row_number over (pr desc, vertex asc)") {
    val edges = (0L until 300L).map(i => (i % 60, (i * 11 + 5) % 60)).toDF("src", "dst")
    val got = Graphs.pageRank(edges, "src", "dst", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = got.sortBy { case (v, pr, _) => (-pr, v) }
      .zipWithIndex.map { case ((v, pr, _), i) => (v, pr, i + 1) }
    assert(got.sortBy(_._1).toSeq == expected.sortBy(_._1).toSeq,
      "rank must equal the driver-side row_number under the same total order")
  }

  test("deep iteration counts (lineage-truncated path) stay deterministic") {
    val edges = (0L until 100L).map(i => (i % 25, (i * 3 + 1) % 25)).toDF("src", "dst")
    val a = Graphs.pageRank(edges, "src", "dst", iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val b = Graphs.pageRank(edges, "src", "dst", iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("conserveDanglingMass: identical with no dangling vertices, more mass with") {
    // a full cycle — no dangling vertex, D_t = 0, variants must agree exactly
    val cycle = (0L until 10L).map(i => (i, (i + 1) % 10)).toDF("src", "dst")
    val off = Graphs.pageRank(cycle, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val on = Graphs.pageRank(cycle, "src", "dst", iters = 3,
        conserveDanglingMass = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(off.toSeq == on.toSeq, "no dangling mass ⇒ the option is a no-op")
    // a chain — vertex 3 dangles; conserving redistributes its mass
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val totalOff = Graphs.pageRank(chain, "src", "dst", iters = 2)
      .agg(sum(col("pr"))).head.getLong(0)
    val totalOn = Graphs.pageRank(chain, "src", "dst", iters = 2,
        conserveDanglingMass = true)
      .agg(sum(col("pr"))).head.getLong(0)
    assert(totalOn > totalOff, s"conservation must keep more mass: $totalOn vs $totalOff")
    assert(totalOn <= 1000000000000L, "floors only lose mass — never exceed the grid")
  }

  test("mass bookkeeping: every pr carries at least the base term") {
    val edges = (0L until 20L).map(i => (i, (i * 3 + 1) % 20)).toDF("src", "dst")
    val prs = Graphs.pageRank(edges, "src", "dst", iters = 2)
      .collect().map(_.getLong(1))
    val n = 20L
    val base = 1000000000000L * 15L / (100L * n)
    assert(prs.forall(_ >= base))
    // total mass never exceeds the grid total (floors only lose mass)
    assert(prs.sum <= 1000000000000L)
  }
}
