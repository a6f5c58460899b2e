package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, NamedExpression, SortOrder}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, ShuffleSpec}
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2ScanRelation}
import org.apache.spark.sql.vectorized.ColumnarBatch

/**
 * Reported output partitioning for the graft source (SURVEY §2.1 S2; the
 * reference's `SupportsReportPartitioning` via `CassandraScanBuilder.java:122`
 * + `CassandraPartitioning.java`): graft-written files are token-range
 * partitioned and, when ranges are pairwise disjoint, every row of one
 * partition key lives in exactly ONE whole-file input partition — so a
 * `groupBy(pk)` / LWW window / static propagation over such a scan needs NO
 * shuffle the layout hasn't already paid for.
 *
 * Stock Spark 4's DSv2 can only exploit `KeyGroupedPartitioning` with
 * discrete per-partition key VALUES (storage-partitioned joins), which
 * cannot express a hash-token RANGE layout. So the report happens at the
 * physical layer instead, where Catalyst's own `Distribution` contract is
 * exactly the property the layout guarantees:
 *
 *  - [[GraftClusteredPartitioning]] — satisfies `ClusteredDistribution(c)`
 *    whenever the partition keys ⊆ c (same pk ⇒ same Murmur3 token ⇒ same
 *    disjoint file range ⇒ same partition). It deliberately reports a
 *    never-compatible [[ShuffleSpec]]: the layout clusters rows, but it is
 *    NOT Spark's `HashPartitioning`, so it must never be treated as
 *    co-partitioned with a genuinely hash-shuffled join side.
 *  - [[GraftClusteredScanExec]] — zero-cost passthrough wrapper carrying the
 *    partitioning claim (rows/batches are the child's, untouched).
 *  - [[GraftClusteredScanStrategy]] — plans `PhysicalOperation` over a
 *    clustered graft scan as scan→filter→project with the wrapper attached,
 *    mirroring `DataSourceV2Strategy`'s shape. Installed via
 *    `spark.experimental.extraStrategies` (see `graft.Graft.install`);
 *    purely an optimization — without it plans keep their exchanges and
 *    remain correct.
 */
case class GraftClusteredPartitioning(
    clusterKeys: Seq[Expression],
    numPartitions: Int) extends Partitioning {

  override def satisfies0(required: Distribution): Boolean =
    super.satisfies0(required) || (required match {
      case ClusteredDistribution(clustering, requireAll, _) if clusterKeys.nonEmpty =>
        val subset = clusterKeys.forall(k => clustering.exists(_.semanticEquals(k)))
        val all = !requireAll ||
          (clustering.length == clusterKeys.length &&
            clustering.forall(c => clusterKeys.exists(_.semanticEquals(c))))
        subset && all
      case _ => false
    })

  /** Clustered-but-not-hash: never co-partitioned with anything, and not a
   *  partitioning EnsureRequirements may shuffle OTHER plans into.
   *
   *  Why no co-located-join spec: stock EnsureRequirements
   *  only consults `isCompatibleWith` against a "best" spec chosen among
   *  specs with `canCreatePartitioning = true`, and claiming that would
   *  require a partitioning `ShuffleExchangeExec` can execute (custom
   *  Partitionings throw at runtime); KeyGroupedPartitioning gets its own
   *  special-cased SPJ bypass, custom specs get none, and KeyGrouped itself
   *  cannot express token RANGES (discrete values only). Same-ring-split
   *  joins are therefore an explicit operator — `graft.operators.Colocated`
   *  — which zips the aligned whole-file partitions directly. */
  override def createShuffleSpec(distribution: ClusteredDistribution): ShuffleSpec =
    new ShuffleSpec {
      override def numPartitions: Int = GraftClusteredPartitioning.this.numPartitions
      override def isCompatibleWith(other: ShuffleSpec): Boolean = false
      override def canCreatePartitioning: Boolean = false
    }
}

case class GraftClusteredScanExec(
    child: SparkPlan,
    clusterKeys: Seq[Expression]) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning =
    GraftClusteredPartitioning(clusterKeys, child.outputPartitioning.numPartitions)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def supportsColumnar: Boolean = child.supportsColumnar
  override def vectorTypes: Option[Seq[String]] = child.vectorTypes
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = child.executeColumnar()
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** A graft scan that can vouch for a clustered layout exposes the partition
 *  key names it clusters by (None when the layout cannot guarantee it).
 *  Ring-split co-location is NOT threaded through the physical partitioning
 *  (nothing in stock EnsureRequirements could consult it — see
 *  [[GraftClusteredPartitioning.createShuffleSpec]]); the co-located join
 *  is the explicit `graft.operators.Colocated`, which derives ranges from
 *  the manifest. */
trait ClusterReportingScan {
  def clusteredPkNames: Option[Seq[String]]
}

object GraftClusteredScanStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PhysicalOperation(project, filters,
        rel @ DataSourceV2ScanRelation(v2rel, scan: ClusterReportingScan, output, None, _))
        if scan.clusteredPkNames.nonEmpty && {
          // resolve pk names the way the analyzer does (case-insensitive by
          // default) — a .option("pk", "L_ORDERKEY") over column l_orderkey
          // must not silently disable the clustering claim
          val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
          scan.clusteredPkNames.get.forall(n => output.exists(a => resolver(a.name, n)))
        } =>
      val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
      val keys = scan.clusteredPkNames.get.map(n => output.find(a => resolver(a.name, n)).get)
      val batch = BatchScanExec(output, scan.asInstanceOf[org.apache.spark.sql.connector.read.Scan],
        Seq.empty, None, v2rel.table)
      val wrapped = GraftClusteredScanExec(batch, keys)
      val filtered = filters.reduceOption(And).map(FilterExec(_, wrapped)).getOrElse(wrapped)
      val planned: SparkPlan =
        if (project == filtered.output) filtered
        else ProjectExec(project.asInstanceOf[Seq[NamedExpression]], filtered)
      planned :: Nil
    case _ => Nil
  }
}

object ClusteredScanUtil {
  /** Regroup size-split parquet partitions into ONE partition per file —
   *  required for the clustering claim (a pk straddling a row-group split
   *  boundary would otherwise span two partitions). `order` fixes the
   *  partition INDEX per file (nominal ring start / token min) so two
   *  co-located scans index their shared ranges identically. */
  def wholeFilePartitions(
      partitions: Array[InputPartition],
      order: Map[String, Long] = Map.empty): Array[InputPartition] = {
    val files = partitions.flatMap {
      case fp: FilePartition => fp.files
      case other =>
        throw new IllegalStateException(s"unexpected non-file partition: ${other.getClass}")
    }
    // key by the DECODED Hadoop path: FileMeta.path (the `order` keys) comes
    // from FileStatus.getPath.toString, while SparkPath.toString is
    // URL-encoded — a dir with a space would otherwise lose its ring order
    files.groupBy(_.filePath.toPath.toString).toSeq
      .sortBy { case (p, _) => (order.getOrElse(p, Long.MinValue), p) }
      .zipWithIndex.map {
        case ((_, splits), i) => FilePartition(i, splits.sortBy(_.start)): InputPartition
      }.toArray
  }

  /** Idempotently install the clustered-scan strategy into a session. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(GraftClusteredScanStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftClusteredScanStrategy
    }
  }
}
