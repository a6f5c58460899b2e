package graft

import org.apache.spark.sql.SparkSession

/**
 * Session setup for the graft engine. [[install]] registers the
 * clustered-scan planning strategy (S2 reported partitioning — see
 * `org.apache.spark.sql.graftshim.ClusteredScan`) via
 * `spark.experimental.extraStrategies`: public API, idempotent, works on an
 * already-created session. Purely an optimization — every graft plan is
 * correct without it, it only removes shuffles a disjoint token layout has
 * already paid for.
 */
object Graft {
  def install(spark: SparkSession): Unit =
    org.apache.spark.sql.graftshim.ClusteredScanUtil.install(spark)
}
