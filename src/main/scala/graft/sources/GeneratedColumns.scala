package graft.sources

import java.time.{LocalDate, ZoneId}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, Substring, Year}
import org.apache.spark.sql.catalyst.util.GeneratedColumn
import org.apache.spark.sql.functions.{col, expr, format_string, lit, raise_error, when}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DateType, IntegerType, StructField, StructType}

import graft.model.CqlSchema

/**
 * `GENERATED ALWAYS AS (expr)` columns (the Delta generated-column
 * design): the generation expression rides in the field metadata Spark's
 * DDL writes (`GENERATION_EXPRESSION`), the catalog round-trips it, and
 * two engine hooks make it live:
 *
 *  - WRITE ([[fill]]): a missing/null generated value is computed from
 *    the expression in the same projection (codegen'd, no extra pass); a
 *    PROVIDED value is kept only when it null-safe-equals the computed
 *    one, else the write fails row-level loudly — "always generated"
 *    means user data can never disagree with the expression.
 *  - READ ([[derive]]): filters on the SOURCE column imply filters on
 *    the generated column for MONOTONE expression shapes — `CAST(src AS
 *    DATE)` and `year(src)` map ranges and equality, `substring(src, 1,
 *    n)` maps equality — so a `WHERE ts BETWEEN …` prunes the
 *    `PARTITIONED BY (day)` directories without the user ever naming
 *    `day`. Derived predicates are PRUNING-ONLY conjuncts (implied by
 *    the originals, never returned to Spark) — at 100 TB this is the
 *    difference between scanning a week and scanning the table when
 *    queries filter on the raw timestamp.
 */
object GeneratedColumns {

  /** The session zone the generation expressions were FIRST evaluated
   *  under, recorded at CREATE in the field metadata. `CAST(ts AS DATE)`
   *  renders a different day under a different session zone — a table
   *  whose files mixed zones would have values the derivation (and the
   *  expression itself) cannot reason about, so writes VALIDATE against
   *  this and derivation maps bounds IN it. */
  val ZoneKey = "GRAFT_GENERATION_ZONE"

  /** (column → generation SQL) for every generated field. */
  def expressions(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.flatMap { f =>
      GeneratedColumn.getGenerationExpression(f).map(f.name -> _)
    }

  private def zoneOf(f: StructField): Option[ZoneId] =
    if (f.metadata.contains(ZoneKey))
      Some(ZoneId.of(f.metadata.getString(ZoneKey)))
    else None

  /** The session zone, resolved the one way everywhere (scan derivation,
   *  procedure scopes, write validation). */
  def sessionZone(spark: org.apache.spark.sql.SparkSession): ZoneId =
    try ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    catch { case _: Exception => ZoneId.systemDefault() }

  /** Writes to a table with zone-recorded generated columns must run
   *  under the SAME session zone the expressions were created under —
   *  `CAST(ts AS DATE)` under a different zone would store days the
   *  table's derivation (and every earlier file) disagrees with. */
  private def validateZone(df: DataFrame, schema: StructType): Unit = {
    val current = sessionZone(df.sparkSession)
    schema.fields.foreach { f =>
      zoneOf(f).foreach { created =>
        require(created == current,
          s"generated column ${f.name}: the session timeZone ($current) " +
            s"differs from the zone the table's generation expressions were " +
            s"created under ($created) — set spark.sql.session.timeZone to " +
            s"'$created' for writes to this table")
      }
    }
  }

  private def isGenerated(f: StructField): Boolean =
    GeneratedColumn.getGenerationExpression(f).isDefined

  /** Write-side: compute missing/null generated values, validate provided
   *  ones (null-safe equality, else `raise_error` inside the projection —
   *  single-pass). Column order is preserved; absent generated columns
   *  are appended in schema order. */
  def fill(df: DataFrame, schema: StructType): DataFrame = {
    if (hasAny(schema)) validateZone(df, schema)
    expressions(schema).foldLeft(df) { case (acc, (name, sql)) =>
      val computed = expr(sql).cast(schema(name).dataType)
      if (!acc.columns.contains(name)) acc.withColumn(name, computed)
      else acc.withColumn(name,
        when(col(name).isNull, computed)
          .when(col(name) <=> computed, col(name))
          .otherwise(raise_error(format_string(
            s"GENERATED ALWAYS AS column $name: provided value %s != computed %s",
            col(name).cast("string"), computed.cast("string"))).cast(schema(name).dataType)))
    }
  }

  /** Rewrite-side: a DML rewrite (UPDATE/MERGE) may change a source
   *  column without naming the generated one — recompute
   *  unconditionally so the invariant holds by construction. */
  def recompute(df: DataFrame, schema: StructType): DataFrame = {
    if (hasAny(schema)) validateZone(df, schema)
    expressions(schema).foldLeft(df) { case (acc, (name, sql)) =>
      acc.withColumn(name, expr(sql).cast(schema(name).dataType))
    }
  }

  private def hasAny(schema: StructType): Boolean =
    schema.fields.exists(isGenerated)

  // ---- read-side pruning inference ----------------------------------

  private sealed trait Shape {
    def src: String
    def map(v: Any): Option[Any]
    def rangeSafe: Boolean
  }
  /** `CAST(src AS DATE)`: monotone; instant → session-zone local date. */
  private final case class CastDate(src: String, zone: ZoneId) extends Shape {
    def rangeSafe = true
    def map(v: Any): Option[Any] = toLocalDate(v, zone).map(java.sql.Date.valueOf)
  }
  /** `year(src)`: monotone over dates/timestamps. */
  private final case class YearOf(src: String, zone: ZoneId) extends Shape {
    def rangeSafe = true
    def map(v: Any): Option[Any] = toLocalDate(v, zone).map(d => Int.box(d.getYear))
  }
  /** `substring(src, 1, n)`: equality-only (collation-proof). */
  private final case class Prefix(src: String, n: Int) extends Shape {
    def rangeSafe = false
    def map(v: Any): Option[Any] = v match {
      case s: String => Some(s.take(n))
      case _ => None
    }
  }
  /** `date_format(src, '<iso prefix>')` for the chronological-prefix
   *  patterns ('yyyy', 'yyyy-MM', 'yyyy-MM-dd', 'yyyy-MM-dd HH') — the
   *  monthly/hourly STRING partition idiom. Monotone: lexicographic
   *  order of these renderings IS chronological order. */
  private final case class IsoFormat(src: String, pattern: String, zone: ZoneId)
      extends Shape {
    def rangeSafe = true
    private val fmt = java.time.format.DateTimeFormatter.ofPattern(
      pattern.replace("yyyy", "uuuu")) // proleptic year — matches Spark's rendering for CE
    def map(v: Any): Option[Any] = v match {
      case t: java.sql.Timestamp => Some(t.toInstant.atZone(zone).format(fmt))
      case i: java.time.Instant => Some(i.atZone(zone).format(fmt))
      case dt: java.time.LocalDateTime => Some(dt.format(fmt))
      case d: java.sql.Date => Some(d.toLocalDate.atStartOfDay.format(fmt))
      case d: LocalDate => Some(d.atStartOfDay.format(fmt))
      case _ => None
    }
  }
  private val IsoPatterns = Set("yyyy", "yyyy-MM", "yyyy-MM-dd", "yyyy-MM-dd HH")

  private def toLocalDate(v: Any, zone: ZoneId): Option[LocalDate] = v match {
    case t: java.sql.Timestamp => Some(t.toInstant.atZone(zone).toLocalDate)
    case i: java.time.Instant => Some(i.atZone(zone).toLocalDate)
    case d: java.sql.Date => Some(d.toLocalDate)
    case d: LocalDate => Some(d)
    case dt: java.time.LocalDateTime => Some(dt.toLocalDate) // TIMESTAMP_NTZ
    case _ => None
  }

  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 => Some(a.nameParts.head)
      case _ => None
    }
  }
  private object Fn { // parseExpression leaves functions unresolved
    def unapply(e: Expression): Option[(String, Seq[Expression])] = e match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.length == 1 && !f.isDistinct =>
        Some((f.nameParts.head.toLowerCase(java.util.Locale.ROOT), f.arguments))
      case _ => None
    }
  }

  private def shapeOf(sql: String, zone: ZoneId): Option[Shape] =
    try CatalystSqlParser.parseExpression(sql) match {
      case Cast(Attr(src), DateType, _, _) => Some(CastDate(src, zone))
      case Fn("to_date", Seq(Attr(src))) => Some(CastDate(src, zone))
      case Year(Attr(src)) => Some(YearOf(src, zone))
      case Fn("year", Seq(Attr(src))) => Some(YearOf(src, zone))
      case Substring(Attr(src), Literal(1, IntegerType), Literal(n: Int, IntegerType))
          if n > 0 => Some(Prefix(src, n))
      case Fn("substring" | "substr" | "left",
          Seq(Attr(src), Literal(1, IntegerType), Literal(n: Int, IntegerType)))
          if n > 0 => Some(Prefix(src, n))
      case Fn("left", Seq(Attr(src), Literal(n: Int, IntegerType))) if n > 0 =>
        Some(Prefix(src, n))
      case Fn("date_format", Seq(Attr(src), Literal(p, _)))
          if p != null && IsoPatterns(p.toString) =>
        Some(IsoFormat(src, p.toString, zone))
      case _ => None
    } catch { case _: Exception => None }

  /** Pruning-only conjuncts on generated columns implied by pushed
   *  filters on their source columns. Sound for monotone shapes: x > v
   *  implies f(x) >= f(v), so ranges weaken to the inclusive bound;
   *  equality maps exactly. Unrecognized shapes/values derive nothing. */
  def derive(pushed: Array[Filter], schema: StructType, zone: ZoneId): Array[Filter] = {
    // a zone recorded at CREATE wins over the caller's session zone —
    // bounds must map in the zone the stored values were rendered under
    val shapes: Seq[(String, Shape)] = expressions(schema).flatMap {
      case (name, sql) =>
        shapeOf(sql, zoneOf(schema(name)).getOrElse(zone)).map(name -> _)
    }
    if (shapes.isEmpty) return Array.empty
    val uq = CqlSchema.unquoted _
    def one(f: Filter, gcol: String, s: Shape): Option[Filter] = f match {
      case EqualTo(c, v) if uq(c) == s.src => s.map(v).map(EqualTo(gcol, _))
      case In(c, vs) if uq(c) == s.src =>
        val mapped = vs.map(s.map)
        if (mapped.forall(_.isDefined)) Some(In(gcol, mapped.map(_.get).distinct))
        else None
      case GreaterThan(c, v) if uq(c) == s.src && s.rangeSafe =>
        s.map(v).map(GreaterThanOrEqual(gcol, _))
      case GreaterThanOrEqual(c, v) if uq(c) == s.src && s.rangeSafe =>
        s.map(v).map(GreaterThanOrEqual(gcol, _))
      case LessThan(c, v) if uq(c) == s.src && s.rangeSafe =>
        s.map(v).map(LessThanOrEqual(gcol, _))
      case LessThanOrEqual(c, v) if uq(c) == s.src && s.rangeSafe =>
        s.map(v).map(LessThanOrEqual(gcol, _))
      case And(l, r) =>
        (one(l, gcol, s), one(r, gcol, s)) match {
          case (Some(a), Some(b)) => Some(And(a, b))
          case (a, b) => a.orElse(b) // conjunction: either side alone is implied
        }
      case Or(l, r) => // disjunction needs BOTH sides to imply something
        for (a <- one(l, gcol, s); b <- one(r, gcol, s)) yield Or(a, b)
      case _ => None
    }
    pushed.flatMap(f => shapes.flatMap { case (g, s) => one(f, g, s) })
  }
}
