package graft.write

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import graft.sources.TokenPruner
import graft.sources.TokenPruner.FileMeta
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * Write-time scan-planning manifest (SURVEY S3 at 100 TB scale): per data
 * file, the stats the scan planner needs — size, uncompressed size, rows,
 * `_graft_token` min/max, integral-column min/max. The reference's analog is
 * the Sidecar snapshot listing + per-SSTable Summary/Index metadata the
 * planner consults instead of opening every SSTable; here the writer records
 * footer facts ONCE when a file is created, so a later scan plans with one
 * small TSV read instead of ~800k sequential footer walks.
 *
 * Format: TSV lines under `<table>/_graft_manifest/manifest-<uuid>.tsv`
 * (append-only — one manifest file per write batch; underscore prefix hides
 * the dir from plain parquet listings and from [[TokenPruner.listDataFiles]]).
 * Columns: relative path, size, uncompressedSize, rows, hasToken,
 * tokenMin|-, tokenMax|-, colRanges (`col=min:max;...`). Plain text keeps
 * both ends dependency-free and debuggable; the read path treats the
 * manifest as a CACHE — files it doesn't cover simply fall back to a footer
 * read, so a stale or missing manifest can never change results.
 */
object Manifest {

  val Dir = "_graft_manifest"

  private val PartIndex = """part-(\d+)""".r

  /** Record manifest rows for any data file not yet covered (call after a
   *  write; reads only the NEW files' footers). When the write used the
   *  exact ring-split layout, `ringSplits = Some(n)` stamps each new file
   *  with its NOMINAL `splitRing(n)` range (recovered from the part index in
   *  the file name — FileFormatWriter numbers files by task partition id). */
  def appendFor(
      spark: SparkSession,
      tableDir: String,
      ringSplits: Option[Int] = None): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(tableDir)
    val fs = root.getFileSystem(conf)
    val known = read(fs, root).keySet
    val fresh = TokenPruner.listDataFiles(fs, root)
      .filterNot(f => known.contains(f.getPath.toString))
    if (fresh.isEmpty) return
    val splits = ringSplits.map(n => graft.token.TokenRanges.splitRing(n))
    val metas = fresh.map { f =>
      val base = TokenPruner.readFooterMeta(conf, f.getPath, f.getLen)
      val nominal = splits.flatMap { rs =>
        PartIndex.findFirstMatchIn(f.getPath.getName)
          .map(_.group(1).toInt)
          .filter(_ < rs.length)
          .map(i => (rs(i).start, rs(i).end))
      }
      base.copy(ringSplit = nominal)
    }
    val out = fs.create(new Path(root,
      s"$Dir/manifest-${java.util.UUID.randomUUID().toString.take(12)}.tsv"), false)
    try out.write(metas.map(line(root, _)).mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** All manifest entries for a table dir, keyed by absolute file path.
   *  Entries for files that no longer exist are ignored by the caller
   *  (listing drives; the manifest only supplies stats). */
  def read(fs: FileSystem, tableDir: Path): Map[String, FileMeta] = {
    val dir = new Path(tableDir, Dir)
    if (!fs.exists(dir)) return Map.empty
    val acc = mutable.Map.empty[String, FileMeta]
    fs.listStatus(dir).filter(_.getPath.getName.endsWith(".tsv")).sortBy(_.getPath.getName)
      .foreach { mf =>
        val in = fs.open(mf.getPath)
        val text = try {
          val bytes = new Array[Byte](mf.getLen.toInt)
          in.readFully(0, bytes)
          new String(bytes, StandardCharsets.UTF_8)
        } finally in.close()
        text.linesIterator.filter(_.nonEmpty).foreach { l =>
          parse(tableDir, l).foreach(m => acc(m.path) = m)
        }
      }
    acc.toMap
  }

  private def line(root: Path, m: FileMeta): String = {
    val rel = relativize(root, m.path)
    val tok = m.tokenRange.map { case (a, b) => s"$a\t$b" }.getOrElse("-\t-")
    val ring = m.ringSplit.map { case (a, b) => s"$a\t$b" }.getOrElse("-\t-")
    val ranges = m.pkRanges.toSeq.sortBy(_._1)
      .map { case (c, (mn, mx)) => s"$c=$mn:$mx" }.mkString(";")
    s"$rel\t${m.sizeBytes}\t${m.uncompressedBytes}\t${m.rows}\t${m.hasTokenColumn}\t$tok\t$ranges\t$ring"
  }

  private def parse(root: Path, l: String): Option[FileMeta] = {
    val parts = l.split("\t", -1)
    // 8 = original format (no ring columns); 10 = with nominal ring range
    if (parts.length != 8 && parts.length != 10) return None
    try {
      def range(a: String, b: String): Option[(Long, Long)] =
        if (a == "-" || b == "-") None else Some((a.toLong, b.toLong))
      val tokenRange = range(parts(5), parts(6))
      val ranges = parts(7).split(";").filter(_.nonEmpty).flatMap { kv =>
        kv.split("=", 2) match {
          case Array(c, r) => r.split(":", 2) match {
            case Array(mn, mx) => Some(c -> (mn.toLong, mx.toLong))
            case _ => None
          }
          case _ => None
        }
      }.toMap
      val ring = if (parts.length == 10) range(parts(8), parts(9)) else None
      Some(FileMeta(new Path(root, parts(0)).toString, parts(1).toLong, parts(2).toLong,
        parts(3).toLong, parts(4).toBoolean, tokenRange, ranges, ring))
    } catch { case _: NumberFormatException => None }
  }

  private def relativize(root: Path, abs: String): String = {
    val rootStr = root.toString.stripSuffix("/") + "/"
    if (abs.startsWith(rootStr)) abs.substring(rootStr.length) else abs
  }
}
