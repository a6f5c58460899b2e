package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiling harness (optimization guide §1): run one battery query with
  * the Bench session config and print every Spark job it submits — wall
  * time, description, stage count — so the per-phase cost of multi-action
  * queries (write → digest → footer → commit → read) is visible without the
  * UI. `runMain graft.tools.ProfileOne <query> [reps]`; env like RunOne. */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProfileOne <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))

    final case class Job(id: Int, desc: String, start: Long, var end: Long = 0L,
        var stages: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs(e.jobId) = Job(e.jobId, desc, e.time, stages = e.stageIds.size)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
    }

    (1 to reps).foreach { i =>
      jobs.clear()
      if (i == reps) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rep$i: $dt%.3f s ($n rows)")
      if (i == reps) {
        spark.sparkContext.removeSparkListener(listener)
        Thread.sleep(200) // let trailing job-end events drain
        val rows = jobs.synchronized(jobs.values.toSeq).sortBy(_.start)
        val accounted = rows.map(j => math.max(0L, j.end - j.start)).sum / 1e3
        println(f"[profile] jobs=${rows.size} accounted=$accounted%.3f s of $dt%.3f s wall (gap = driver-side planning/FS)")
        var prevEnd = 0L
        rows.foreach { j =>
          if (prevEnd > 0L && j.start - prevEnd > 200L)
            println(f"[profile]   gap ${(j.start - prevEnd) / 1e3}%9.3f s (driver)")
          prevEnd = math.max(prevEnd, j.end)
          val ms = math.max(0L, j.end - j.start)
          println(f"[profile]   job=${j.id}%3d ${ms / 1e3}%7.3f s stages=${j.stages}%2d  ${j.desc.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
