package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev scratch probe — not part of the public surface. Current form: print
  * the formatted physical plan of one battery query (the .explain audit
  * loop): `runMain graft.tools.Probe <query> [sfDir]`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Probe <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
