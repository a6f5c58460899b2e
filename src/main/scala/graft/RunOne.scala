package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time one battery query in isolation, N repetitions.
 *
 *  `sbt "runMain graft.RunOne q69_dedup_drop 3"` — same session config as
 *  [[Bench]] (local[cpus], shuffle.partitions=cpus, warm-up pass) so numbers
 *  are comparable to `BENCH_r*.json` entries, but without the run-order and
 *  co-tenancy effects of the full battery. Used to adjudicate per-query
 *  regressions flagged by the judge.
 */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: RunOne <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.install(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name rep$i: $dt%.3f s ($n rows)")
      dt
    }
    println(f"$name min=${times.min}%.3f median=${times.sorted.apply(reps / 2)}%.3f max=${times.max}%.3f")
    spark.stop()
  }
}
