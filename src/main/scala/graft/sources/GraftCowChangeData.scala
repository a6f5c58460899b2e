package graft.sources

import graft.model.CqlSchema
import graft.write.{DeletionVectors, Snapshots}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Change-data recording for COPY-ON-WRITE row-level DML (`changeFeedCow
 * 'true'` table option — the Delta `delta.enableChangeDataFeed` /
 * `_change_data` design): a CoW UPDATE/MERGE/DELETE rewrites whole file
 * groups, which breaks file-level change provenance — without a record,
 * the change feed must refuse at the rewrite. With the option on, the
 * DML derives its row-level events and stores them as `_graft_cdc/`
 * sidecar parquet (rows tagged `_change_type` ∈ delete|insert),
 * referenced by `cdc` lines in the SAME atomic commit; the feed then
 * delivers exactly those events and rides across the rewrite.
 *
 * Derivation: a full-outer join of the affected groups' OLD rows
 * (scanned files, source-version DVs applied) against their NEW rows
 * (the replacement generation) on the full primary key. Key missing on
 * one side → insert/delete; present on both with different values → the
 * delete+insert pair (an update); identical → carried unchanged, no
 * event. Cost is O(affected-group rows) — one join plus one sidecar
 * write, paid at DML time by the table that opted into CDC (the same
 * trade Delta documents). Requires pk-unique affected rows (row-level
 * DML addresses rows by key); duplicate keys refuse loudly rather than
 * emit a cross-product of fabricated events.
 */
private[sources] object GraftCowChangeData {

  /** Compute + persist the DML's change-data rows; returns the sidecar
   *  file paths to reference from the rewrite commit (empty = no row
   *  actually changed — a no-op DML records no events). */
  def record(
      spark: SparkSession,
      dir: String,
      cql: CqlSchema,
      sourceVersion: Long,
      scanned: Seq[String],
      replacement: DataFrame): Seq[String] = {
    val keys = (cql.partitionKeys ++ cql.clusteringKeys).toIndexedSeq
    val cols = replacement.columns.toIndexedSeq
    require(keys.forall(cols.contains),
      s"changeFeedCow: rewrite schema ${cols.mkString(",")} lacks key column(s) " +
        s"${keys.filterNot(cols.contains).mkString(",")}")
    val valueCols = cols.filterNot(keys.contains)

    // old rows: the scanned files with the SOURCE version's DVs applied —
    // a MoR-then-CoW mix must not resurrect already-deleted positions
    val dvs = Snapshots.deletionVectors(spark, dir, sourceVersion)
      .filter { case (carrier, _) => scanned.contains(carrier) }
    val oldRaw =
      if (scanned.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], replacement.schema)
      else Snapshots.stripEngineColumns(
        DeletionVectors.applyToRead(spark, scanned, dvs))
    // align to the replacement's columns: pre-evolution files lack new
    // columns — their preimages read null there
    val oldRows = replacement.schema.fields.foldLeft(oldRaw) { (df, f) =>
      if (df.columns.contains(f.name)) df
      else df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(cols.map(col): _*)

    def packed(df: DataFrame, tag: String): DataFrame =
      df.select(keys.map(col) :+
        (if (valueCols.isEmpty) lit(0) else struct(valueCols.map(col): _*)).as(tag): _*)
    val joined = packed(oldRows, "__cdc_o")
      .join(packed(replacement, "__cdc_n"), keys, "full_outer")

    // pk-uniqueness guard: duplicate keys in the affected rows would make
    // the key join a cross-product of fabricated events
    val dup = joined.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).count() > 0
    if (dup)
      throw new UnsupportedOperationException(
        s"changeFeedCow on $dir: affected rows are not unique per primary key " +
          s"(${keys.mkString(",")}) — row-level change derivation addresses rows " +
          "by key; deduplicate first or disable changeFeedCow")

    val changed = joined.filter(!(col("__cdc_o") <=> col("__cdc_n")))
    def unpack(side: String, tag: String): DataFrame =
      changed.filter(col(side).isNotNull).select(
        keys.map(col) ++
          valueCols.map(c => col(side).getField(c).as(c)) :+
          lit(tag).as(Snapshots.ChangeTypeCol): _*)
    val cdc = unpack("__cdc_o", "delete").unionByName(unpack("__cdc_n", "insert"))

    val stage = s"$dir/${Snapshots.CdcDir}/cdc-${java.util.UUID.randomUUID().toString.take(12)}"
    cdc.write.parquet(stage)
    val p = new org.apache.hadoop.fs.Path(stage)
    val fsys = p.getFileSystem(spark.sessionState.newHadoopConf())
    def list(): Seq[String] = fsys.listStatus(fsys.makeQualified(p))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSeq
    val files = list()
    if (files.nonEmpty) files
    else {
      // a no-op DML (every row carried unchanged) must STILL reference a
      // sidecar: the `cdc` lines are what let the feed ride across the
      // rewrite — an empty event set is delivered as zero rows
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cdc.schema)
        .repartition(1).write.mode("overwrite").parquet(stage)
      list()
    }
  }
}
