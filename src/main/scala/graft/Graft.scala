package graft

import org.apache.spark.sql.SparkSession

/**
 * Session setup for the graft engine. [[install]] registers
 *  1. the clustered-scan planning strategy (S2 reported partitioning — see
 *     `org.apache.spark.sql.graftshim.ClusteredScan`) via
 *     `spark.experimental.extraStrategies`: purely an optimization — every
 *     graft plan is correct without it, it only removes shuffles a disjoint
 *     token layout has already paid for;
 *  2. the SQL function surface (`graft_token`, `image_dims`, the MinHash
 *     family, … — see [[graft.functions.registerAll]]) so plain
 *     `spark.sql` reaches every native expression.
 * Public APIs only, idempotent, works on an already-created session.
 */
object Graft {
  def install(spark: SparkSession): Unit = {
    org.apache.spark.sql.graftshim.ClusteredScanUtil.install(spark)
    graft.functions.registerAll(spark)
  }
}
