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
