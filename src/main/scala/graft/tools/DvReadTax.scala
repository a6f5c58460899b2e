package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the merge-on-read READ TAX: the same table scanned clean
 *  (vectorized splits) vs carrying one tiny deletion vector (every file
 *  whole-file row-based — partition uniformity forces the whole scan
 *  row-based). Prints median seconds for a full-scan aggregate in each
 *  state; the delta is the per-scan cost OPTIMIZE's fold removes.
 *
 *  `sbt "runMain graft.tools.DvReadTax [sfDir] [reps]"` */
object DvReadTax {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)

    val dir = java.nio.file.Files.createTempDirectory("graft_dvtax_").toString + "/t"
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"))
    graft.write.TokenSortedWriter.write(docs, graft.model.CqlSchema("t", Seq("doc_id")),
      dir, org.apache.spark.sql.SaveMode.Append,
      graft.write.TokenSortedWriter.WriteConf(numPartitions = 8, snapshot = true))

    def scan() = spark.read.format("graft").option("path", dir).option("pk", "doc_id").load()
    def time(tag: String): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        scan().agg(sum(length(col("text"))), sum(col("n_chars"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(reps / 2)
      println(f"$tag%-10s median=$med%.3f s (reps: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      med
    }
    time("warmup")
    val clean = time("clean")

    // one 1-row DV on ONE file → the whole scan turns row-based
    val v0 = graft.write.Snapshots.latestVersion(spark, dir).get
    val file = graft.write.Snapshots.files(spark, dir, v0).head
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dv = graft.write.DeletionVectors.newDvPath(dir)
    graft.write.DeletionVectors.write(fs, dv, Array(0L))
    graft.write.Snapshots.commitDeltas(spark, dir, Map(file -> dv), Nil, Some(v0))
    val taxed = time("with-dv")

    graft.write.TokenSortedWriter.optimizeSmallFiles(spark,
      graft.model.CqlSchema("t", Seq("doc_id")), dir,
      smallBytes = 1L << 30, targetBytes = 1L << 30)
    val folded = time("folded")
    println(f"read tax: ${taxed / clean}%.2fx while DVs live; " +
      f"${folded / clean}%.2fx after OPTIMIZE folds them")
    spark.stop()
  }
}
