package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev scratch probe — not part of the public surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // drive the multimodal decode path end-to-end through the public API
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("blob", col("text").cast("binary"))
    val decoded = graft.operators.Multimodal.decodeImages(
      graft.operators.Multimodal.withBlobMetadata(docs, "blob"), "blob")
    decoded.select("doc_id", "byte_len", "container", "width", "height", "mean_luma")
      .show(5, false)
    println("DECODED ROWS=" + decoded.count())
    spark.stop()
  }
}
