package graft.sources

import java.net.{URLDecoder, URLEncoder}

import org.apache.spark.sql.connector.catalog.constraints.{Check, Constraint, PrimaryKey, Unique}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.types.StructType

/**
 * Table-constraint persistence for [[GraftCatalog]] tables — the Spark 4
 * DSv2 constraint SPI (`TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT`)
 * over the one-line descriptor format.
 *
 * Surface (all plain SQL):
 * {{{
 *   CREATE TABLE cat.db.t (…, CONSTRAINT pos CHECK (v > 0)) USING graft …
 *   ALTER TABLE cat.db.t ADD CONSTRAINT c CHECK (n < 10)   -- validates data
 *   ALTER TABLE cat.db.t DROP CONSTRAINT c
 *   ALTER TABLE cat.db.t ADD CONSTRAINT pk PRIMARY KEY (id) RELY
 * }}}
 *
 * Division of labor with stock Spark — the engine does NOT re-implement
 * enforcement:
 *  - `ResolveTableConstraints` (analysis) wraps every V2 write — INSERT,
 *    INSERT OVERWRITE, copy-on-write ReplaceData AND merge-on-read
 *    WriteDelta — with `CheckInvariant` filters built from the enforced
 *    CHECK constraints this table reports, so a violating row fails the
 *    write before anything commits;
 *  - `AddCheckConstraintExec` scans existing data when a CHECK is added
 *    and only then hands the catalog the constraint with
 *    `validationStatus = VALID`.
 * The catalog's job is exactly (a) persist/reload constraints through
 * the descriptor, and (b) refuse schema changes that would orphan a
 * constraint's columns. CHECK may be ENFORCED; PRIMARY KEY / UNIQUE are
 * informational (Spark itself refuses to enforce them) but RELY marks
 * them trustworthy for downstream planning. FOREIGN KEY is refused: it
 * names a second table, and a file-backed descriptor cannot keep a
 * cross-table reference honest.
 *
 * Wire format (descriptor pair `constraints`, one line): records joined
 * by `;`, fields by `|`, free-text fields URL-encoded so predicate SQL
 * can contain anything:
 * `KIND|name|payload|enforced|validationStatus|rely|refs`
 * where payload is the CHECK predicate SQL or the PK/UNIQUE column list,
 * and refs is the `,`-joined referenced-column list captured at ADD time
 * (drives the rename/drop guards without re-parsing SQL).
 *
 * Reference surface: the reference has no constraint system — this is
 * switch-over surface the catalog gains from the Spark SPI, like the
 * catalog itself (GraftCatalog.scala Scaladoc).
 */
private[sources] object GraftTableConstraints {

  final case class Stored(
      kind: String, // CHECK | PK | UNIQUE
      name: String,
      payload: String, // CHECK: predicate SQL; PK/UNIQUE: csv column list
      enforced: Boolean,
      status: String, // Constraint.ValidationStatus name
      rely: Boolean,
      refs: Seq[String]) {

    def toConnector: Constraint = kind match {
      case "CHECK" =>
        Constraint.check(name).predicateSql(payload)
          .enforced(enforced)
          .validationStatus(Constraint.ValidationStatus.valueOf(status))
          .rely(rely).build()
      case "PK" =>
        Constraint.primaryKey(name, cols).enforced(enforced)
          .validationStatus(Constraint.ValidationStatus.valueOf(status))
          .rely(rely).build()
      case "UNIQUE" =>
        Constraint.unique(name, cols).enforced(enforced)
          .validationStatus(Constraint.ValidationStatus.valueOf(status))
          .rely(rely).build()
      case other => throw new IllegalStateException(s"corrupt constraint kind $other")
    }

    private def cols = payload.split(',').map(Expressions.column)
  }

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = URLDecoder.decode(s, "UTF-8")

  /** Admission + conversion of a connector constraint the DDL hands us. */
  def fromConnector(c: Constraint, schema: StructType): Stored = {
    val stored = c match {
      case ch: Check =>
        val refs = Option(ch.predicate())
          .map(_.references().map(_.fieldNames.mkString(".")).toSeq)
          .filter(_.nonEmpty)
          .getOrElse(inferRefs(ch.predicateSql(), schema))
        Stored("CHECK", ch.name, ch.predicateSql(), ch.enforced(),
          ch.validationStatus().name, ch.rely(), refs)
      case pk: PrimaryKey =>
        val cols = pk.columns().map(_.fieldNames.mkString(".")).toSeq
        Stored("PK", pk.name, cols.mkString(","), pk.enforced(),
          pk.validationStatus().name, pk.rely(), cols)
      case u: Unique =>
        val cols = u.columns().map(_.fieldNames.mkString(".")).toSeq
        Stored("UNIQUE", u.name, cols.mkString(","), u.enforced(),
          u.validationStatus().name, u.rely(), cols)
      case other => throw new UnsupportedOperationException(
        s"graft tables support CHECK / PRIMARY KEY / UNIQUE constraints; " +
          s"FOREIGN KEY names a second table a file-backed descriptor cannot " +
          s"keep honest — got ${other.toDDL}")
    }
    val missing = stored.refs.filterNot(r =>
      schema.fieldNames.exists(_.equalsIgnoreCase(r)))
    require(missing.isEmpty,
      s"constraint ${stored.name} references unknown column(s) ${missing.mkString(", ")}")
    require(stored.refs.forall(!_.contains(".")),
      s"constraint ${stored.name}: only top-level columns are supported, " +
        s"got ${stored.refs.filter(_.contains(".")).mkString(", ")}")
    stored
  }

  /** Referenced columns of a CHECK whose connector Predicate didn't make
   *  it across (SQL-only constraint): every schema field name that
   *  appears in the predicate text as a standalone identifier or
   *  backtick-quoted. Conservative by construction — a false positive
   *  only makes a rename/drop guard stricter, never enforcement wrong. */
  private[sources] def inferRefs(sql: String, schema: StructType): Seq[String] = {
    val idents = "`([^`]+)`|[A-Za-z_][A-Za-z0-9_]*".r
      .findAllMatchIn(sql)
      .map(m => if (m.group(1) != null) m.group(1) else m.matched)
      .map(_.toLowerCase).toSet
    schema.fieldNames.filter(f => idents.contains(f.toLowerCase)).toSeq
  }

  def render(cs: Seq[Stored]): String = cs.map(c =>
    Seq(c.kind, enc(c.name), enc(c.payload), c.enforced.toString, c.status,
      c.rely.toString, enc(c.refs.mkString(","))).mkString("|")).mkString(";")

  def parse(s: String): Seq[Stored] =
    s.split(';').toSeq.map(_.trim).filter(_.nonEmpty).map { rec =>
      rec.split('|') match {
        case Array(kind, name, payload, enforced, status, rely, refs) =>
          Stored(kind, dec(name), dec(payload), enforced.toBoolean, status,
            rely.toBoolean, dec(refs).split(',').toSeq.filter(_.nonEmpty))
        case _ => throw new IllegalArgumentException(s"corrupt constraint record: $rec")
      }
    }

  def parseOption(v: Option[String]): Seq[Stored] =
    v.map(parse).getOrElse(Nil)
}
