package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("stage metrics ride the single action: rows and cost per stage, one job") {
    val docs = (1L to 100L).map(i => (i, i * 10L)).toDF("id", "tokens")
    val (s1, in) = Observe.stage(docs, "ingest", costCol = Some("tokens"))
    val filtered = in.filter(col("id") % 4 === 0)
    val (s2, out) = Observe.stage(filtered, "post_filter", costCol = Some("tokens"))
    val n = out.count() // the ONE action; metrics piggyback on it
    assert(n === 25L)
    val rep = Observe.report(Seq(s1, s2))
    assert(rep("ingest") === ((100L, (1L to 100L).map(_ * 10L).sum)))
    assert(rep("post_filter") === ((25L, (1L to 100L).filter(_ % 4 == 0).map(_ * 10L).sum)))
  }

  test("a rows-only stage reports cost 0; drop ratio is derivable") {
    val docs = (1L to 50L).map(i => (i, s"doc $i")).toDF("id", "text")
    val (s1, in) = Observe.stage(docs, "all")
    val (s2, kept) = Observe.stage(in.filter(col("id") <= 5), "kept")
    kept.count()
    val rep = Observe.report(Seq(s1, s2))
    assert(rep("all") === ((50L, 0L)) && rep("kept") === ((5L, 0L)))
    assert(rep("kept")._1.toDouble / rep("all")._1 === 0.1)
  }

  test("streaming variant surfaces per-batch metrics through query progress") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val observed = Observe.stageStreaming(
      mem.toDF().toDF("id").filter(col("id") % 2 === 0), "even_rows")
    val q = observed.writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    try {
      mem.addData(1L to 10L: _*)
      q.processAllAvailable()
      val progress = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("even_rows"))).lastOption
      assert(progress.isDefined, "expected observed metrics in query progress")
      assert(progress.get.getAs[Long]("rows") === 5L)
    } finally q.stop()
  }
}
