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
    val b0 = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // same A/B hook as ProfileOne: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    val spark = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "").split(';')
      .filter(_.contains('=')).foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.install(spark)
    val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    val df = fn(spark, sfDir)
    // Spark's formatted mode can throw NoSuchElementException on plans with
    // a ReusedExchange under AQE (attribute-map bug in the formatted
    // printer only — execution and other explain modes are unaffected);
    // fall back so the plan-audit loop still produces output.
    try df.explain("formatted")
    catch {
      case scala.util.control.NonFatal(e) =>
        println(s"[probe] formatted explain failed (${e.getClass.getSimpleName}: " +
          s"${e.getMessage}); falling back to extended")
        df.explain("extended")
    }
    spark.stop()
  }
}
