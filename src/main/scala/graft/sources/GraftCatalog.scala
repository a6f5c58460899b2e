package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import graft.model.CqlSchema
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, Metadata, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * A DSv2 `TableCatalog` over a base directory: every table is a graft
 * token-sorted dir plus a tiny `_graft_table.meta` descriptor (schema JSON +
 * role/layout pairs), so the full lifecycle works in pure SQL:
 *
 * {{{
 *   spark.sql.catalog.graft_cat      = graft.sources.GraftCatalog
 *   spark.sql.catalog.graft_cat.base = /data/graft
 *
 *   CREATE TABLE graft_cat.db.events (id BIGINT, cat STRING, v BIGINT)
 *     USING graft PARTITIONED BY (cat) OPTIONS (pk 'id')
 *   INSERT INTO graft_cat.db.events SELECT …      -- token-sorted write
 *   SELECT … FROM graft_cat.db.events WHERE id=7  -- pruned graft scan
 *   DROP TABLE graft_cat.db.events
 * }}}
 *
 * `PARTITIONED BY (c…)` maps to `WriteConf.partitionBy` (identity
 * transforms only — the token ring already covers hash distribution).
 * The descriptor is one line of schema JSON + TAB-separated pairs: no
 * JSON library round-trips, debuggable with cat. The reference has no
 * catalog (TableProvider only) — this is surface the switch-over user
 * gains, built entirely from the same GraftTable.
 */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  /** Opts into `CREATE TABLE (…, CONSTRAINT …)` / `ALTER TABLE ADD|DROP
   *  CONSTRAINT` — see [[GraftTableConstraints]] for the contract (stock
   *  Spark enforces; the catalog persists and guards) — and into column
   *  DEFAULT values (`c INT DEFAULT 7`, `ALTER COLUMN c SET/DROP
   *  DEFAULT`). Defaults live in the schema JSON's field metadata
   *  (`CURRENT_DEFAULT`/`EXISTS_DEFAULT`, the stock encoding), so the
   *  descriptor round-trips them for free and the analyzer's
   *  `ResolveDefaultColumns` fills omitted columns / DEFAULT keywords at
   *  write time. `ADD COLUMNS (c T DEFAULT …)` is refused: rows already
   *  on disk would need a reader-side fill our null-reading scan does
   *  not perform — the same refusal Delta ships. */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      // `c T GENERATED ALWAYS AS (expr)` — Spark validates the expression
      // at CREATE and stores it in the field metadata the descriptor
      // round-trips; the engine computes/validates at write and derives
      // partition pruning from source-column filters ([[GeneratedColumns]])
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      // `c BIGINT GENERATED ALWAYS|BY DEFAULT AS IDENTITY (START WITH …
      // INCREMENT BY …)` — the engine allocates at write from a
      // log-carried per-column mark ([[IdentityColumns]])
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  // ---- SQL maintenance procedures (`CALL cat.system.<proc>(…)`): the
  // library maintenance entry points as one-statement SQL — see
  // [[GraftProcedures]] for the surface and contracts

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace.toSeq == Seq("system"),
      s"procedures live under the 'system' namespace, got ${ident.namespace.mkString(".")}")
    GraftProcedures.load(this, ident.name)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system"))
      GraftProcedures.list.map(Identifier.of(Array("system"), _))
    else Array.empty

  /** Resolve a procedure's `table` argument (`<ns>.<name>` or a bare
   *  name) to the table dir (external LOCATION honored) and its key
   *  layout. Key columns are rename-refused, so the descriptor's pk/ck
   *  names are physical — safe for the rewrite procedures. */
  private[sources] def resolveMaintenance(tableArg: String)
      : (String, graft.model.CqlSchema) = {
    val parts = tableArg.split('.').toSeq.filter(_.nonEmpty)
    require(parts.nonEmpty, s"bad table argument '$tableArg' (want '<ns>.<name>')")
    val ident = Identifier.of(parts.init.toArray, parts.last)
    val dir = dirFor(ident)
    val f = fs(dir)
    if (!f.exists(metaPath(dir))) throw new NoSuchTableException(ident)
    val (schema, pairs) = GraftCatalog.readMeta(f, metaPath(dir))
    val opts = new util.HashMap[String, String]()
    pairs.foreach { case (k, v) => opts.put(k, v) }
    val dirStr = pairs.toMap.getOrElse("location", dir.toString)
    (dirStr, GraftDataSource.cqlFrom(new CaseInsensitiveStringMap(opts), schema))
  }

  /** SHALLOW CLONE (CALL system.clone): create the TARGET's descriptor as
   *  a verbatim copy of the source's — schema with ALL field metadata
   *  (defaults, generation expressions, identity specs), pk/ck layout,
   *  options, constraints, colmap, droppedPhys — then commit the
   *  metadata-only snapshot referencing the source's files
   *  ([[graft.write.Snapshots.shallowClone]]), or, with `deep = true`,
   *  the DEEP copy ([[graft.write.Snapshots.deepClone]]: distributed
   *  file copy, digest-verified, layout preserved) that survives source
   *  vacuums. An external LOCATION is not copied — the clone's own
   *  writes land under the clone's dir. Returns (clone dir,
   *  clone version = 1). */
  private[sources] def cloneTable(
      sourceArg: String,
      targetArg: String,
      version: Option[Long],
      tag: Option[String] = None,
      deep: Boolean = false): (String, Long) = {
    require(version.isEmpty || tag.isEmpty,
      "clone: give version OR tag, not both")
    def identOf(arg: String): Identifier = {
      val parts = arg.split('.').toSeq.filter(_.nonEmpty)
      require(parts.nonEmpty, s"bad table argument '$arg' (want '<ns>.<name>')")
      Identifier.of(parts.init.toArray, parts.last)
    }
    val srcIdent = identOf(sourceArg)
    val srcDir = dirFor(srcIdent)
    val sf = fs(srcDir)
    if (!sf.exists(metaPath(srcDir))) throw new NoSuchTableException(srcIdent)
    val (schema, pairs) = GraftCatalog.readMeta(sf, metaPath(srcDir))
    val pmap = pairs.toMap
    // dir-partitioned sources clone fine: the graft_p_<col>=<value> path
    // segments ride inside the ABSOLUTE foreign references, so partition
    // pruning on the clone re-derives them from the path exactly as it
    // does for local files (TokenPruner.dirValues), and the data column
    // itself lives in every file (the twin invariant)
    val srcData = pmap.getOrElse("location", srcDir.toString)
    val tgtIdent = identOf(targetArg)
    if (tableExists(tgtIdent)) throw new TableAlreadyExistsException(tgtIdent)
    val tgtDir = dirFor(tgtIdent)
    val tf = fs(tgtDir)
    val pairsOut = ((pmap - "location") + ("snapshot" -> "true")).toSeq.sortBy(_._1)
    // resolve the pin BEFORE the target descriptor exists — a bad tag
    // must refuse leaving nothing behind
    val pin = tag match {
      case Some(t) => Some(graft.write.Snapshots.tagVersion(
        SparkSession.active, srcData, t))
      case None => version
    }
    GraftCatalog.writeMeta(tf, metaPath(tgtDir), schema, pairsOut)
    val v =
      try {
        if (deep) graft.write.Snapshots.deepClone(
          SparkSession.active, srcData, tgtDir.toString, pin)
        else graft.write.Snapshots.shallowClone(
          SparkSession.active, srcData, tgtDir.toString, pin)
      } catch {
        case e: Throwable => tf.delete(metaPath(tgtDir), false); throw e
      }
    (tgtDir.toString, v)
  }

  // ---- namespaces = directories under the base (SQL CREATE/SHOW/DROP
  // NAMESPACE); no metadata beyond existence — a namespace IS its dir
  private def nsDir(namespace: Array[String]): Path =
    new Path((base +: namespace.toSeq).mkString("/"))

  override def listNamespaces(): Array[Array[String]] = {
    val b = new Path(base)
    val f = fs(b)
    if (!f.exists(b)) return Array.empty
    // same table-dir exclusion as the nested overload: a table created
    // without a namespace (base/<name>) is a table, not a namespace
    f.listStatus(b).filter(s => s.isDirectory &&
        !f.exists(new Path(s.getPath, GraftCatalog.MetaFile)))
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val d = nsDir(namespace)
    val f = fs(d)
    if (!f.exists(d)) throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchNamespaceException(namespace)
    f.listStatus(d).filter(s => s.isDirectory &&
        !f.exists(new Path(s.getPath, GraftCatalog.MetaFile)))
      .map(s => namespace :+ s.getPath.getName)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    fs(nsDir(namespace)).exists(nsDir(namespace))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace)
    new util.HashMap[String, String]()
  }

  override def createNamespace(
      namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(namespace)
    fs(nsDir(namespace)).mkdirs(nsDir(namespace))
    ()
  }

  override def alterNamespace(
      namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces carry no mutable metadata")

  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    val f = fs(d)
    if (!f.exists(d)) return false
    if (!cascade && f.listStatus(d).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NonEmptyNamespaceException(namespace)
    f.delete(d, cascade)
  }

  private var catalogName: String = _
  private var base: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    base = options.get("base")
    require(base != null && base.nonEmpty,
      s"catalog $name requires option spark.sql.catalog.$name.base")
  }

  override def name(): String = catalogName

  private def fs(p: Path) =
    p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  private def dirFor(ident: Identifier): Path =
    new Path((base +: ident.namespace.toSeq :+ ident.name).mkString("/"))

  private def metaPath(dir: Path): Path = new Path(dir, GraftCatalog.MetaFile)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = new Path((base +: namespace.toSeq).mkString("/"))
    val f = fs(nsDir)
    if (!f.exists(nsDir)) return Array.empty
    f.listStatus(nsDir).filter(_.isDirectory)
      .filter(s => f.exists(metaPath(s.getPath)))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    fs(dir).exists(metaPath(dir))
  }

  override def loadTable(ident: Identifier): Table = loadPinned(ident, None)

  /** SQL time travel — `SELECT … FROM cat.t VERSION AS OF 3`. The version
   *  string resolves against the table's snapshot log exactly like the
   *  `snapshotVersion` source option ("latest" and "asof:<millis>" pins
   *  included). */
  override def loadTable(ident: Identifier, version: String): Table =
    loadPinned(ident, Some(version))

  /** SQL time travel — `… TIMESTAMP AS OF <ts>`. Spark hands MICROseconds
   *  since epoch; the log's commit times are millis ([[graft.write.
   *  Snapshots.versionAsOf]] resolves the floor version). */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    loadPinned(ident, Some(s"asof:${timestamp / 1000L}"))

  private def loadPinned(ident: Identifier, pin: Option[String]): Table = {
    val dir = dirFor(ident)
    val f = fs(dir)
    if (!f.exists(metaPath(dir))) throw new NoSuchTableException(ident)
    val (schema, pairs) = GraftCatalog.readMeta(f, metaPath(dir))
    val opts = new util.HashMap[String, String]()
    pairs.foreach { case (k, v) => opts.put(k, v) }
    // external tables point at their LOCATION; managed tables at the
    // catalog-owned dir the descriptor lives in
    opts.put("path", pairs.toMap.getOrElse("location", dir.toString))
    pin.foreach(p => opts.put("snapshotVersion", p))
    val options = new CaseInsensitiveStringMap(opts)
    val cql = GraftDataSource.cqlFrom(options, schema)
    new GraftTable(opts.get("path"), GraftDataSource.annotateStruct(cql, schema), cql, options)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala
    def opt(key: String): Option[String] =
      props.get(TableCatalog.OPTION_PREFIX + key).orElse(props.get(key))
    val pk = opt("pk").getOrElse(throw new IllegalArgumentException(
      s"CREATE TABLE $ident requires OPTIONS (pk '<cols>') — the partition key drives " +
        "the token layout"))
    // `CLUSTER BY (a, b)` arrives as a ClusterByTransform among the
    // partition transforms — it maps to the Z-order write layout
    // ([[graft.write.TokenSortedWriter.zorderSorted]]): files cover
    // narrow min/max ranges on EVERY clustering column, so stats pruning
    // works on each axis
    val clusterCols = partitions.toSeq.collect {
      case org.apache.spark.sql.connector.expressions.ClusterByTransform(refs) =>
        refs.map(_.fieldNames.mkString("."))
    }.flatten
    val dirCols = partitions.toSeq
      .filter(!_.isInstanceOf[org.apache.spark.sql.connector.expressions.ClusterByTransform])
      .map {
        case t if t.name == "identity" && t.references.length == 1 =>
          t.references()(0).fieldNames.mkString(".")
        case other => throw new IllegalArgumentException(
          s"only identity PARTITIONED BY columns are supported (token hashing is built in), got $other")
      }
    if (clusterCols.nonEmpty)
      GraftCatalog.validateClusterBy(clusterCols, schema, dirCols)
    if (org.apache.spark.sql.catalyst.util.IdentityColumn.hasIdentityColumns(schema))
      require(opt("snapshot").exists(_.trim.toBoolean),
        s"CREATE TABLE $ident with IDENTITY column(s) requires OPTIONS " +
          "(snapshot 'true') — the allocation mark lives in the snapshot log")
    val pairs = Seq("pk" -> pk) ++
      opt("ck").map("ck" -> _) ++
      opt("static").map("static" -> _) ++
      opt("partitions").map("partitions" -> _) ++
      opt("maxRecordsPerFile").map("maxRecordsPerFile" -> _) ++
      opt("snapshot").map("snapshot" -> _) ++ // snapshotted INSERTs → time travel
      opt("dmlMode").map("dmlMode" -> _) ++ // copy-on-write | merge-on-read
      // CoW DML records row-level change-data sidecars (CDC across rewrites)
      opt("changeFeedCow").map("changeFeedCow" -> _) ++
      // stable per-row ids surviving OPTIMIZE and DML rewrites (snapshot
      // required — validated at first write)
      opt("rowTracking").map("rowTracking" -> _) ++
      // `CREATE TABLE … LOCATION '<dir>'` = EXTERNAL table: the catalog
      // holds only the descriptor; data lives (and stays, through DROP)
      // at the given path — the standard way to register a directory a
      // bulk job already wrote
      opt("location").map("location" -> _) ++
      (if (dirCols.nonEmpty) Seq("partitionBy" -> dirCols.mkString(",")) else Nil) ++
      (if (clusterCols.nonEmpty) Seq("zorderBy" -> clusterCols.mkString(",")) else Nil)
    val dir = dirFor(ident)
    val f = fs(dir)
    f.mkdirs(dir)
    GraftCatalog.writeMeta(f, metaPath(dir), schema, pairs)
    loadTable(ident)
  }

  /** `CREATE TABLE (…, CONSTRAINT …)`: the TableInfo create — same path
   *  as the classic overload, plus constraint admission + persistence.
   *  The table is born empty, so whatever validation status Spark hands
   *  us is trivially honest. */
  override def createTable(
      ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): Table = {
    // `GENERATED ALWAYS AS (expr)` arrives on the v2 Column objects but
    // info.schema drops it — re-encode into field metadata so the
    // descriptor persists it (the same key Spark's DDL uses elsewhere)
    val table = createTable(ident,
      GraftCatalog.withGenerationExpressions(info.schema, info.columns),
      info.partitions, info.properties)
    if (info.constraints() != null && info.constraints().nonEmpty) {
      val stored = info.constraints().toSeq
        .map(GraftTableConstraints.fromConnector(_, info.schema))
      require(stored.map(_.name.toLowerCase).distinct.size == stored.size,
        s"duplicate constraint names in CREATE TABLE $ident")
      val dir = dirFor(ident)
      val f = fs(dir)
      val (schema, pairs) = GraftCatalog.readMeta(f, metaPath(dir))
      GraftCatalog.writeMeta(f, metaPath(dir), schema,
        pairs :+ ("constraints" -> GraftTableConstraints.render(stored)),
        overwrite = true)
      loadTable(ident)
    } else table
  }

  /** Schema evolution in SQL — every alter that is SAFE on a name-mapped
   *  parquet layout without rewriting data:
   *
   *   - `ADD COLUMNS (c T)` (nullable, top-level, appended): existing
   *     files simply read null for the new column (q154 proved the scan
   *     path). Re-adding a previously DROPPED logical name gets a FRESH
   *     physical name (`c__r<n>`), so the old files' stored bytes can
   *     never resurrect — the field-id-style severing Delta/Iceberg get
   *     from column mapping;
   *   - `DROP COLUMN c` for non-key columns: the meta schema shrinks, the
   *     stale bytes in old files are pruned away by every future scan,
   *     and the column's PHYSICAL name is recorded so a future re-add
   *     cannot reconnect to it;
   *   - `RENAME COLUMN a TO b` for non-key columns: metadata-only — the
   *     physical parquet name stays what it always was (the `colmap`
   *     logical→physical indirection; writes keep producing the physical
   *     name, scans translate), so existing data stays connected and no
   *     file is rewritten. Key / clustering / dir-partition columns
   *     refuse (they drive the layout and the pruning stats).
   *
   *  Type changes are REFUSED: a metadata-only type change corrupts
   *  stored data. Property changes other than these are likewise refused
   *  loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.TableChange._
    val dir = dirFor(ident)
    val f = fs(dir)
    if (!f.exists(metaPath(dir))) throw new NoSuchTableException(ident)
    val (schema0, pairs0) = GraftCatalog.readMeta(f, metaPath(dir))
    // dir-partition columns are as load-bearing as keys: dropping one would
    // leave a stale partitionBy option and break every subsequent INSERT
    var zorder: Seq[String] = pairs0.toMap.get("zorderBy").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    // clustering columns guard like keys: their footer stats ARE the
    // pruning index (re-cluster with CLUSTER BY NONE first to free them)
    def keyCols = pairs0.toMap.get("pk").toSeq.flatMap(_.split(',')).map(_.trim) ++
      pairs0.toMap.get("ck").toSeq.flatMap(_.split(',')).map(_.trim) ++
      pairs0.toMap.get("partitionBy").toSeq.flatMap(_.split(',')).map(_.trim) ++
      zorder
    var colMap = GraftCatalog.parseColMap(pairs0.toMap.get("colmap"))
    var droppedPhys = pairs0.toMap.get("droppedPhys").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty)
    var constraints = GraftTableConstraints.parseOption(pairs0.toMap.get("constraints"))
    // a schema change that touches a column some constraint references
    // would leave the stored predicate pointing at nothing (or at the
    // wrong data under a type change) — refuse; DROP CONSTRAINT first
    def requireUnconstrained(col: String, what: String): Unit = {
      val holders = constraints.filter(_.refs.exists(_.equalsIgnoreCase(col)))
      require(holders.isEmpty,
        s"cannot $what column $col — constraint(s) ${holders.map(_.name).mkString(", ")} " +
          s"reference it; DROP CONSTRAINT first")
    }
    val schema = changes.foldLeft(schema0) { (s, change) =>
      change match {
        case ac: AddConstraint =>
          val stored = GraftTableConstraints.fromConnector(ac.constraint(), s)
          require(!constraints.exists(_.name.equalsIgnoreCase(stored.name)),
            s"constraint ${stored.name} already exists on $ident")
          constraints = constraints :+ stored
          s
        case dc: DropConstraint =>
          val exists = constraints.exists(_.name.equalsIgnoreCase(dc.name))
          if (!exists && !dc.ifExists)
            throw new IllegalArgumentException(s"no such constraint ${dc.name} on $ident")
          constraints = constraints.filterNot(_.name.equalsIgnoreCase(dc.name))
          s
        case cb: ClusterBy =>
          // `ALTER TABLE … CLUSTER BY (a, b)` / `CLUSTER BY NONE` — changes
          // the layout of FUTURE writes; existing files keep their order
          // (OPTIMIZE packs within-layout; a full re-cluster is a rewrite)
          val cols = cb.clusteringColumns().map(_.fieldNames.mkString(".")).toSeq
          if (cols.nonEmpty)
            GraftCatalog.validateClusterBy(cols, s,
              pairs0.toMap.get("partitionBy").toSeq.flatMap(_.split(',')).map(_.trim))
          zorder = cols
          s
        case a: AddColumn =>
          require(a.fieldNames.length == 1,
            s"only top-level ADD COLUMNS supported, got ${a.fieldNames.mkString(".")}")
          require(a.isNullable,
            s"added column ${a.fieldNames.head} must be nullable (existing rows have no value)")
          require(!s.fieldNames.contains(a.fieldNames.head),
            s"column ${a.fieldNames.head} already exists")
          require(a.position() == null,
            s"ADD COLUMNS FIRST/AFTER is not supported (new columns append; " +
              s"parquet resolves by name, so order is cosmetic here)")
          // ADD COLUMNS … DEFAULT: record the write-time CURRENT_DEFAULT
          // plus the read-time EXISTS_DEFAULT (folded literal) — rows in
          // files written before the column existed read the default at
          // scan time, per file, via Spark's own parquet readers (the
          // Iceberg initial-default / Delta ADD COLUMN DEFAULT semantic)
          val fieldMeta = Option(a.defaultValue()) match {
            case None => Metadata.empty
            case Some(dv) =>
              require(dv.getValue != null,
                s"ADD COLUMNS ${a.fieldNames.head} DEFAULT must be a " +
                  "constant-foldable expression — rows already on disk read " +
                  "the value FOLDED AT ADD TIME (the exists-default), which a " +
                  "non-constant expression cannot provide")
              ExistsDefaults.metadataFor(dv.getSql, dv.getValue)
          }
          val name = a.fieldNames.head
          // the default physical name is the logical one; if files may
          // ever have stored that physical name (it was dropped, or a
          // rename left it behind), mint a fresh one — severs old bytes
          val taken = droppedPhys.toSet ++ colMap.values
          if (taken.contains(name)) {
            val fresh = Iterator.from(1).map(i => s"${name}__r$i")
              .find(c => !taken.contains(c) && !s.fieldNames.contains(c)).get
            colMap = colMap + (name -> fresh)
          }
          StructType(s.fields :+ org.apache.spark.sql.types.StructField(
            name, a.dataType, nullable = true, fieldMeta))
        case d: DeleteColumn =>
          require(d.fieldNames.length == 1,
            s"only top-level DROP COLUMN supported, got ${d.fieldNames.mkString(".")}")
          val name = d.fieldNames.head
          require(!keyCols.contains(name),
            s"cannot drop key column $name (it drives the token layout)")
          require(s.fieldNames.contains(name), s"no such column $name")
          requireUnconstrained(name, "drop")
          // remember the physical name: a future re-add must not reconnect
          droppedPhys = (droppedPhys :+ colMap.getOrElse(name, name)).distinct
          colMap = colMap - name
          StructType(s.fields.filterNot(_.name == name))
        case r: RenameColumn =>
          require(r.fieldNames.length == 1,
            s"only top-level RENAME COLUMN supported, got ${r.fieldNames.mkString(".")}")
          val from = r.fieldNames.head
          val to = r.newName
          require(s.fieldNames.contains(from), s"no such column $from")
          require(!s.fieldNames.contains(to), s"column $to already exists")
          require(!keyCols.contains(from),
            s"cannot rename key/partition column $from (it drives the token " +
              "layout and the pruning statistics)")
          requireUnconstrained(from, "rename")
          // physical name NEVER moves: logical `to` now points at it
          val phys = colMap.getOrElse(from, from)
          colMap = colMap - from + (to -> phys)
          StructType(s.fields.map(fld =>
            if (fld.name == from) fld.copy(name = to) else fld))
        case u: UpdateColumnDefaultValue =>
          require(u.fieldNames.length == 1,
            s"only top-level SET/DROP DEFAULT supported, got ${u.fieldNames.mkString(".")}")
          val name = u.fieldNames.head
          require(s.fieldNames.contains(name), s"no such column $name")
          // future writes only (CURRENT_DEFAULT): every row already on disk
          // physically stores this column, so the exists-default never
          // applies and stays untouched
          val sql = Option(u.newDefaultValue()).map(_.trim).filter(_.nonEmpty)
          StructType(s.fields.map { fld =>
            if (fld.name != name) fld
            else {
              val mb = new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(fld.metadata)
              sql match {
                case Some(d) => mb.putString("CURRENT_DEFAULT", d)
                case None => mb.remove("CURRENT_DEFAULT")
              }
              fld.copy(metadata = mb.build())
            }
          })
        case u: UpdateColumnType =>
          require(u.fieldNames.length == 1,
            s"only top-level ALTER COLUMN TYPE supported, got ${u.fieldNames.mkString(".")}")
          val name = u.fieldNames.head
          require(s.fieldNames.contains(name), s"no such column $name")
          require(!keyCols.contains(name),
            s"cannot change the type of key/partition column $name — the pk byte " +
              "serialization drives the murmur3 token layout and the pruning stats")
          requireUnconstrained(name, "change the type of")
          val cur = s(name).dataType
          require(GraftCatalog.widensSafely(cur, u.newDataType()),
            s"only value-preserving widenings are metadata-safe on stored parquet " +
              s"(byte/short/int→wider integral or decimal(p,0), float→double, " +
              s"date→timestamp_ntz); got $cur → ${u.newDataType()}")
          StructType(s.fields.map(f =>
            if (f.name == name) f.copy(dataType = u.newDataType()) else f))
        case other => throw new UnsupportedOperationException(
          s"graft tables support only ADD COLUMNS / DROP COLUMN / RENAME COLUMN / " +
            s"widening ALTER COLUMN TYPE alters (any other metadata-only type " +
            s"change corrupts stored data), got $other")
      }
    }
    // identity entries are noise — keep the descriptor minimal
    colMap = colMap.filter { case (l, p) => l != p }
    val carried = pairs0.filterNot(p =>
      p._1 == "colmap" || p._1 == "droppedPhys" || p._1 == "constraints" ||
        p._1 == "zorderBy")
    val pairs = carried ++
      (if (colMap.nonEmpty) Seq("colmap" -> GraftCatalog.renderColMap(colMap)) else Nil) ++
      (if (droppedPhys.nonEmpty) Seq("droppedPhys" -> droppedPhys.mkString(";")) else Nil) ++
      (if (constraints.nonEmpty)
        Seq("constraints" -> GraftTableConstraints.render(constraints)) else Nil) ++
      (if (zorder.nonEmpty) Seq("zorderBy" -> zorder.mkString(",")) else Nil)
    GraftCatalog.writeMeta(f, metaPath(dir), schema, pairs, overwrite = true)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    val f = fs(dir)
    if (!f.exists(metaPath(dir))) false
    else f.delete(dir, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    val toDir = dirFor(to)
    val f = fs(toDir)
    f.mkdirs(toDir.getParent)
    if (!f.rename(dirFor(from), toDir))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }
}

object GraftCatalog {
  val MetaFile = "_graft_table.meta"

  /** Re-encode v2 Column generation expressions AND identity specs into
   *  field metadata — `TableInfo.schema` drops them, and the descriptor
   *  persists the schema JSON, so without this they would vanish at
   *  CREATE. The keys are the stock ones [[GeneratedColumns]] /
   *  [[IdentityColumns]] read back. */
  private[sources] def withGenerationExpressions(
      schema: StructType,
      columns: Array[org.apache.spark.sql.connector.catalog.Column]): StructType = {
    val gens = columns.filter(_.generationExpression() != null)
      .map(c => c.name -> c.generationExpression()).toMap
    val idents = columns.filter(_.identityColumnSpec() != null)
      .map(c => c.name -> c.identityColumnSpec()).toMap
    if (gens.isEmpty && idents.isEmpty) schema
    else StructType(schema.fields.map { f =>
      val withGen = gens.get(f.name).map { sql =>
        new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString(org.apache.spark.sql.catalyst.util.GeneratedColumn
            .GENERATION_EXPRESSION_METADATA_KEY, sql)
          // record the CREATE-time session zone: writes validate against
          // it and scan derivation maps bounds in it — zone-dependent
          // expressions (CAST ts AS DATE) must never mix zones per file
          .putString(GeneratedColumns.ZoneKey, GeneratedColumns
            .sessionZone(org.apache.spark.sql.SparkSession.active).getId)
          .build()
      }
      val withId = idents.get(f.name).map { spec =>
        val ic = org.apache.spark.sql.catalyst.util.IdentityColumn
        new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(withGen.getOrElse(f.metadata))
          .putLong(ic.IDENTITY_INFO_START, spec.getStart)
          .putLong(ic.IDENTITY_INFO_STEP, spec.getStep)
          .putBoolean(ic.IDENTITY_INFO_ALLOW_EXPLICIT_INSERT,
            spec.isAllowExplicitInsert)
          .build()
      }
      withId.orElse(withGen).map(m => f.copy(metadata = m)).getOrElse(f)
    })
  }

  /** CLUSTER BY admission: 2-4 existing top-level columns of a type the
   *  Z-order rank image supports, not combined with directory
   *  partitioning (the writer's documented exclusivity — each is a
   *  layout). */
  private[sources] def validateClusterBy(
      cols: Seq[String], schema: StructType, dirCols: Seq[String]): Unit = {
    import org.apache.spark.sql.types._
    require(cols.size >= 2 && cols.size <= 4,
      s"CLUSTER BY needs 2-4 columns (one-dimension clustering is the token " +
        s"sort; bit-interleaving caps at 4 axes), got ${cols.size}")
    require(dirCols.isEmpty,
      "CLUSTER BY and PARTITIONED BY are mutually exclusive layouts")
    cols.foreach { c =>
      require(!c.contains("."), s"CLUSTER BY supports top-level columns only, got $c")
      require(schema.fieldNames.contains(c), s"no such column $c")
      val dt = schema(c).dataType
      require(dt match {
        case LongType | IntegerType | ShortType | ByteType |
             DateType | TimestampType | StringType => true
        case _ => false
      }, s"CLUSTER BY column $c must be integral, date, timestamp or string, got $dt")
    }
  }

  /** `colmap` pair codec: `logical=physical;logical=physical` — only
   *  non-identity entries are stored. */
  private[sources] def parseColMap(s: Option[String]): Map[String, String] =
    s.toSeq.flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty).map { e =>
      e.split("=", 2) match {
        case Array(l, p) => l -> p
        case _ => throw new IllegalArgumentException(s"corrupt colmap entry: $e")
      }
    }.toMap

  private[sources] def renderColMap(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (l, p) => s"$l=$p" }.mkString(";")

  /** Value-preserving widenings Spark 4's parquet readers evaluate
   *  natively against narrower stored pages (probe-verified: the
   *  vectorized reader upconverts per file, old generations read wide) —
   *  the type-evolution subset that is METADATA-safe. Everything else
   *  (narrowing, float→int, string↔anything, decimal rescale) would
   *  corrupt or refuse at scan time and is rejected up front. */
  private[sources] def widensSafely(
      from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (DateType, TimestampNTZType) => true
      case (ByteType | ShortType | IntegerType | LongType, d: DecimalType) =>
        d.scale == 0 && d.precision >= (from match {
          case ByteType => 3
          case ShortType => 5
          case IntegerType => 10
          case _ => 20
        })
      case _ => false
    }
  }

  /** Line 1: Spark schema JSON. Following lines: key<TAB>value pairs.
   *  `overwrite = true` (alters) truncate-writes in place — a mid-write
   *  crash can leave a torn descriptor, but never the missing-file state
   *  a delete-then-recreate would risk (the table stays discoverable). */
  private[sources] def writeMeta(
      f: org.apache.hadoop.fs.FileSystem,
      p: Path,
      schema: StructType,
      pairs: Seq[(String, String)],
      overwrite: Boolean = false): Unit = {
    val out = f.create(p, overwrite)
    try out.write((schema.json +: pairs.map { case (k, v) => s"$k\t$v" })
      .mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private[sources] def readMeta(
      f: org.apache.hadoop.fs.FileSystem,
      p: Path): (StructType, Seq[(String, String)]) = {
    val in = f.open(p)
    val text = try {
      val len = f.getFileStatus(p).getLen.toInt
      val bytes = new Array[Byte](len)
      in.readFully(0, bytes)
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.linesIterator.toSeq
    val schema = DataType.fromJson(lines.head).asInstanceOf[StructType]
    val pairs = lines.tail.filter(_.nonEmpty).flatMap(_.split("\t", 2) match {
      case Array(k, v) => Some(k -> v)
      case _ => None
    })
    (schema, pairs)
  }
}
