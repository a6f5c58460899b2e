package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("separated blobs cluster together; result is deterministic") {
    // 3 tight blobs around (10,0), (0,10), (-10,-10); seeds are ids 0,1,2
    // which land one per blob (ids mod 3)
    val vecs = (0L until 90L).map { i =>
      val c = (i % 3).toInt
      val base = Seq((10f, 0f), (0f, 10f), (-10f, -10f))(c)
      (i, Array(base._1 + (i % 7) * 0.01f, base._2 + (i % 5) * 0.01f))
    }.toDF("vec_id", "embedding")
    val got = Clustering.kMeansAssign(vecs, "vec_id", "embedding", k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every member of a blob shares its seed's cluster
    (0L until 90L).foreach(i => assert(got(i) == got(i % 3), s"vec $i"))
    assert(got.values.toSet.size == 3)
    val again = Clustering.kMeansAssign(vecs, "vec_id", "embedding", k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == got, "reruns must be bit-identical")
  }

  test("an emptied cluster keeps its previous centroid instead of dying") {
    // seed 1 (id=1) is an outlier immediately absorbed: every point is
    // closer to seed 0 after one update; cluster 1 must survive with its
    // original centroid and the run must not throw
    val vecs = (Seq((0L, Array(0f, 0f)), (1L, Array(100f, 100f))) ++
      (2L until 20L).map(i => (i, Array(i * 0.001f, 0f)))).toDF("vec_id", "embedding")
    val got = Clustering.kMeansAssign(vecs, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == 1 && got(0L) == 0)
    assert((2L until 20L).forall(got(_) == 0))
  }

  test("argmin ties break to the lowest centroid index") {
    // identical vectors everywhere: both centroids stay equal through
    // every update, every assignment ties → lowest index wins always
    val vecs = (0L until 6L).map(i => (i, Array(1f, 1f))).toDF("vec_id", "embedding")
    val got = Clustering.kMeansAssign(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.values.forall(_ == 0))
  }

  test("dist is the exact integer grid distance") {
    val vecs = Seq((0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0.5f, 0f)))
      .toDF("vec_id", "embedding")
    // k=1: centroid after 1 iter = floor(mean of quantized) = floor((0 + 1e6 + 5e5)/3) = 5e5
    val got = Clustering.kMeansAssign(vecs, "vec_id", "embedding", k = 1, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) == 500000L * 500000L)
    assert(got(1L) == 500000L * 500000L)
    assert(got(2L) == 0L)
  }

  test("plan: assignment is a broadcast-free literal map (no corpus shuffle)") {
    val vecs = (0L until 50L).map(i => (i, Array(i.toFloat, 1f))).toDF("vec_id", "embedding")
    val out = Clustering.kMeansAssign(vecs, "vec_id", "embedding", k = 2, iters = 1)
    val plan = out.queryExecution.executedPlan.toString
    // the final assignment projection must not exchange or join — the
    // centroids ride inside the expression as literals
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"assignment must be join-free:\n$plan")
    assert(!plan.linesIterator.exists(l => l.contains("Exchange")),
      s"final assignment must plan zero exchanges:\n$plan")
  }
}
