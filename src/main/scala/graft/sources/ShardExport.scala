package graft.sources

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/**
 * The ONE export scaffolding behind [[TarShards.writeShards]] and
 * [[ZipShards.writeBundles]]: both legs share the ghost-data overwrite
 * guard, the shuffle-by-sample-key + in-partition sort, the
 * sample-boundary size-capped binning, the duplicate-member refusal, and
 * the attempt-isolated dot-temp + rename commit protocol. Only the
 * on-disk record format (tar member blocks vs zip local headers + CD)
 * differs, supplied as a [[ShardExport.PartFormat]] — so a durability
 * fix (rename discipline, stale-part sweep, cleanup listener) lands in
 * exactly one place and both export legs keep identical semantics.
 */
private[sources] object ShardExport {

  val manifestSchema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("n_members", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false)))

  /** One open part file's format-specific writer. Lifecycle per bin:
   *  `open(raw, finalName)` → `append(name, payload)`* → `finish()`
   *  (trailers + close the WHOLE stream stack, including `raw`). */
  trait PartFormat {
    def open(raw: org.apache.hadoop.fs.FSDataOutputStream,
        finalName: String): Unit
    def append(name: String, payload: Array[Byte]): Unit
    /** Bytes accumulated since `open` in the BINNING measure (may be
     *  uncompressed logical bytes, not on-disk bytes). */
    def measure: Long
    def finish(): Unit
  }

  /** Refuse a dirty target unless `overwrite`: a RE-export producing
   *  fewer parts would leave the first run's surplus part files behind,
   *  and the read-back glob would resurrect samples the curation
   *  dropped — ghost data. `overwrite` clears prior part files first,
   *  plus crashed attempts' dot-temps (hidden from read globs, but
   *  garbage). */
  def prepareTarget(spark: org.apache.spark.sql.SparkSession, dir: String,
      overwrite: Boolean, opName: String): Unit = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(base)) {
      val named = fs.listStatus(base).toSeq
      val stale = named
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      if (stale.nonEmpty) {
        require(overwrite,
          s"$dir already holds ${stale.size} part files — a partial " +
            "overwrite would mix exports; pass overwrite = true to clear " +
            "them, or export to a fresh directory")
        stale.foreach(st => fs.delete(st.getPath, false))
      }
      if (overwrite) named
        .filter(st => st.isFile && st.getPath.getName.startsWith(".part-"))
        .foreach(st => fs.delete(st.getPath, false))
    }
  }

  /**
   * Shuffle (key, name, payload) rows by sample key, sort each partition
   * by (key, name), and stream them into size-capped part files through
   * `mkFormat` — rolling ONLY at sample boundaries, so a sample never
   * splits across parts (a part runs at most one sample past `target`,
   * in the format's binning measure).
   *
   * Commit protocol (per part): bytes go to an ATTEMPT-unique dot-temp
   * and rename into place at `finish` — a speculative or zombie attempt
   * can never interleave bytes with the winner's file, a reader can
   * never observe a partially-written part under the final name, and
   * the manifest row always reports a COMPLETE file's length. The
   * (partition, bin, content) assignment is a pure function of the
   * input, so whichever attempt renames last leaves identical bytes.
   * Duplicate (key, name) rows have no stable sort order across task
   * attempts — a speculative retry could write DIFFERENT bytes to the
   * same deterministic file name — so they refuse loudly.
   *
   * Returns the manifest: one row per part (shard, n_members,
   * n_samples, bytes) — `bytes` is the exact on-disk size.
   */
  def writeParts(df: DataFrame, dir: String,
      keyCol: String, nameCol: String, payloadCol: String,
      target: Long, partitions: Int, ext: String, overwrite: Boolean,
      opName: String)(mkFormat: () => PartFormat): DataFrame = {
    val spark = df.sparkSession
    prepareTarget(spark, dir, overwrite, opName)
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val parts = if (partitions > 0) partitions
                else spark.sessionState.conf.numShufflePartitions
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(manifestSchema)
    val outDir = dir
    df.select(col(keyCol).cast("string").as("__k"),
        col(nameCol).cast("string").as("__n"), col(payloadCol).as("__p"))
      .repartition(parts, col("__k"))
      .sortWithinPartitions(col("__k"), col("__n"))
      .mapPartitions { rows =>
        val pid = TaskContext.getPartitionId()
        val base = new org.apache.hadoop.fs.Path(outDir)
        val fs = base.getFileSystem(bc.value.value)
        fs.mkdirs(base)
        val manifest = scala.collection.mutable.ArrayBuffer.empty[Row]
        val tc = TaskContext.get()
        val attempt = if (tc != null) tc.taskAttemptId() else 0L
        var bin = 0
        var fmt: PartFormat = null // non-null iff a part is open
        var hp: org.apache.hadoop.fs.Path = null // final (committed) name
        var tmp: org.apache.hadoop.fs.Path = null // in-progress dot-temp
        var members = 0L
        var samples = 0L
        var curKey: String = null
        var curName: String = null
        def closePart(): Unit = if (fmt != null) {
          fmt.finish()
          fmt = null
          // commit point. If the final name already exists, a prior
          // attempt committed IDENTICAL bytes (content is a pure function
          // of the input) — ADOPT its file and discard our temp. Never
          // delete-then-rename: a zombie attempt killed between the
          // delete and its own rename would erase the winner's committed
          // part while the job reports success — silent data loss.
          if (fs.exists(hp)) fs.delete(tmp, false)
          else if (!fs.rename(tmp, hp)) {
            // rename lost a race with a concurrent attempt: adopt theirs
            require(fs.exists(hp), s"$opName commit failed: $tmp -> $hp")
            fs.delete(tmp, false)
          }
          tmp = null
          manifest += Row(hp.toString, members, samples,
            fs.getFileStatus(hp).getLen)
          members = 0L; samples = 0L; bin += 1
        }
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          if (fmt != null)
            try fmt.finish() catch { case _: java.io.IOException => }
          // a failed attempt's dot-temp is garbage, never data — clean it
          if (tmp != null)
            try fs.delete(tmp, false) catch { case _: java.io.IOException => }
        }
        rows.foreach { r =>
          val key = r.getString(0)
          val name = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          // null keys would defeat the sample-boundary logic (nulls sort
          // first and never differ from the initial curKey) and null
          // names the duplicate refusal — fail loudly and located, like
          // the payload check, not with a deep NPE or a wrong manifest
          require(key != null, s"null sample key (member $name)")
          require(name != null, s"null member name (sample $key)")
          require(payload != null, s"null payload for member $name (sample $key)")
          if (key != curKey) {
            // sample boundary: the only place a part may close
            if (fmt != null && fmt.measure >= target) closePart()
            curKey = key
            curName = null
            samples += 1
          }
          require(curName == null || name != curName,
            s"duplicate member $name in sample $key — $opName needs " +
              "unique (sample_key, member_name) rows for deterministic output")
          curName = name
          if (fmt == null) {
            hp = new org.apache.hadoop.fs.Path(base, f"part-$pid%05d-$bin%05d.$ext")
            tmp = new org.apache.hadoop.fs.Path(base,
              f".part-$pid%05d-$bin%05d.$ext.$attempt%d.tmp")
            fmt = mkFormat()
            fmt.open(fs.create(tmp, true), hp.toString)
          }
          fmt.append(name, payload)
          members += 1
        }
        closePart()
        manifest.iterator
      }(enc)
  }
}
