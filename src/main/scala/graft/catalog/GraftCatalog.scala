package graft.catalog

import graft.streaming.{SnapshotRelation, SnapshotUpsert}
import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** Snapshot tables as a Spark V2 CATALOG: wire
  * `spark.sql.catalog.graft = graft.catalog.GraftCatalog` and
  * `spark.sql.catalog.graft.root = /path/to/tables` (both settable at
  * runtime) and every subdirectory of the root holding a committed
  * manifest resolves by NAME in plain SQL text —
  *
  *   - `SELECT ... FROM graft.events_latest WHERE ...` — served
  *     through [[SnapshotRelation.readSql]] via the V2-to-V1 scan
  *     bridge below, so manifest-planned file skipping (bucket hash,
  *     range stats, value sets, bloom sidecars), merge-on-read delta
  *     folds, and zero-RPC planning all apply unchanged;
  *   - `... FROM graft.t VERSION AS OF 7` / `TIMESTAMP AS OF
  *     '2026-01-01'` — SQL-standard time travel mapped onto the
  *     manifest pins readSql already serves;
  *   - `DELETE FROM graft.t WHERE ...` — Spark's native
  *     filter-delete path ([[SupportsDelete]]) routed to
  *     [[SnapshotUpsert.deleteWhere]]'s atomic commit;
  *   - `INSERT INTO graft.t VALUES/SELECT ...` — the batch merges
  *     through `upsertBatchSnapshot` under the table's RECORDED
  *     layout and merge contract (on a keyed latest-state table,
  *     insert IS a merge; a blind append would break the
  *     one-row-per-key invariant every reader folds by);
  *   - `UPDATE` / `MERGE INTO` — SQL text routed to
  *     [[SnapshotUpsert.updateWhere]] / [[SnapshotUpsert.mergeInto]]
  *     by the resolution rules [[graft.GraftExtensions]] injects
  *     (those need session extensions, which Spark only applies at
  *     session build — the catalog itself works on a live session).
  *
  * Read architecture — why V1Scan instead of a full V2 Scan: the
  * engine's read path is the manifest-backed `FileIndex` relation
  * (Delta's own pattern), and merge-on-read buckets compose into it as
  * a fold UNION that no file-listing scan can express. [[V1Scan]] is
  * Spark's sanctioned bridge for exactly this: the V2 table hands
  * planning a V1 relation whose `buildScan` materializes the
  * already-correct DataFrame ([[SnapshotRelation.readSql]] plus the
  * pushed conjuncts re-stated as a `WHERE`), so the inner query's own
  * optimization — our FileIndex's pruning, parquet pushdown, codegen —
  * happens in the nested plan. Pushed filters are BOTH applied inside
  * (for skipping) and reported residual (Spark re-checks them above;
  * conservative, never wrong). Pruned columns become an inner
  * `select`, so column pruning reaches the parquet scan too.
  *
  * The catalog is read/DML-only by design: tables are CREATED by the
  * engine's writers (`upsertBatchSnapshot` seeds a table, its commit
  * pins layout and schema) — `CREATE TABLE` in SQL text would have to
  * invent bucket/merge contracts the writer must restate anyway, so it
  * is refused with that pointer. `DROP TABLE` is refused too: dropping
  * a snapshot table is `vacuum` + directory removal, an operator
  * action this engine keeps out of casual SQL reach.
  *
  * Like every reader here, a loaded table pins ONE committed version
  * (the newest at load time, or the time-travel pin): concurrent
  * commits never tear a running query; re-resolve the name to see
  * later versions (Spark reloads per statement). */
class GraftCatalog extends TableCatalog with SupportsNamespaces
  with ProcedureCatalog {

  private var catalogName: String = "graft"
  private var initRoot: Option[String] = None

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    initRoot = Option(options.get("root"))
  }

  override def name(): String = catalogName

  /** The tables root, re-read from the LIVE session conf on every
    * lookup (falling back to the init-time option): catalog instances
    * are cached per session, and a pinned init-time root would
    * silently ignore a later `spark.conf.set(...root...)`. */
  private def root(): String = {
    val fromConf = try {
      val s = SparkSession.active
      Option(s.conf.get(s"spark.sql.catalog.$catalogName.root", null))
    } catch { case _: IllegalStateException => None }
    fromConf.orElse(initRoot).getOrElse(sys.error(
      s"graft catalog '$catalogName': set spark.sql.catalog." +
        s"$catalogName.root to the directory holding the tables"))
  }

  private def dirOf(ident: Identifier): String = {
    require(ident.namespace.isEmpty ||
      ident.namespace.sameElements(Array("default")),
      s"graft catalog: only single-level table names are supported " +
        s"(got ${ident.namespace.mkString(".")}.${ident.name})")
    s"${root()}/${ident.name}"
  }

  private def load(ident: Identifier, version: Option[Long],
      asOfMs: Option[Long]): Table = {
    val spark = SparkSession.active
    val dir = dirOf(ident)
    val ok =
      try SnapshotUpsert.resolvePin(spark, dir).nonEmpty
      catch { case _: Exception => false }
    if (!ok) throw new NoSuchTableException(ident)
    new GraftTable(s"$catalogName.${ident.name}", dir, version, asOfMs)
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, None, None)

  /** `VERSION AS OF n` (SQL time travel). */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(
      try version.toLong
      catch { case _: NumberFormatException => sys.error(
        s"graft catalog: VERSION AS OF takes the numeric commit " +
          s"version (see SnapshotUpsert.history), got '$version'") }),
      None)

  /** `TIMESTAMP AS OF ts` (micros from Spark) — readAsOf's rule:
    * the newest version committed at or before the instant. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, None, Some(timestamp / 1000L))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!(namespace.isEmpty || namespace.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(namespace)
    val spark = SparkSession.active
    val r = new Path(root())
    val fs = r.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(r)) return Array.empty
    fs.listStatus(r).iterator
      .filter(st => st.isDirectory &&
        fs.exists(new Path(st.getPath, "_manifests")))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog: tables are created by the engine's writers — " +
        "seed with SnapshotUpsert.upsertBatchSnapshot (its commit pins " +
        "the bucket layout and merge contract SQL DDL cannot state)")

  /** `ALTER TABLE t SET TBLPROPERTIES (...)` — a metadata-only commit
    * through [[SnapshotUpsert.setProps]] (same atomic version step and
    * race rules as a data commit; this is how clustering/value-set/
    * bloom declarations are turned on from SQL text). Anything else —
    * schema or layout changes — goes through the engine's writers
    * (additive evolution rides a merge; bucket changes are
    * `rebucket`) and is refused with that pointer. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val sets = changes.map {
      case s: TableChange.SetProperty => s.property -> s.value
      case other => throw new UnsupportedOperationException(
        s"graft catalog: ALTER TABLE supports SET TBLPROPERTIES only " +
          s"(got ${other.getClass.getSimpleName}) — schema evolves " +
          "additively through merges; layout changes through rebucket")
    }.toMap
    val spark = SparkSession.active
    val dir = dirOf(ident)
    // a metadata-only statement must never shrink the retention a
    // higher-keepVersions operator was preserving: keep every version
    // currently retained (SQL offers nowhere to state retention here;
    // GC stays the data writers' and the vacuum procedure's job)
    val keep = math.max(2,
      SnapshotUpsert.versions(spark, dir).size + 1)
    SnapshotUpsert.setProps(spark, dir, sets, keepVersions = keep)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft catalog: dropping a snapshot table is vacuum + directory " +
        "removal — an operator action, not casual SQL")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: rename the table directory instead")

  // ProcedureCatalog: maintenance as SQL-standard CALL statements
  // (`CALL graft.system.maintain(table => 't')` — Iceberg's runbook
  // shape); implementations in [[GraftProcedures]]
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace.isEmpty ||
      ident.namespace.sameElements(Array("system")),
      s"graft catalog: procedures live in the 'system' namespace " +
        s"(got ${ident.namespace.mkString(".")}.${ident.name})")
    GraftProcedures.load(ident.name, n => s"${root()}/$n").getOrElse(
      sys.error(s"graft catalog: no procedure '${ident.name}' — " +
        s"available: ${GraftProcedures.names.mkString(", ")}"))
  }

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftProcedures.names
        .map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  // SupportsNamespaces: one implicit flat namespace (plus "default")
  override def listNamespaces(): Array[Array[String]] =
    Array(Array.empty[String], Array("default"))
  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) Array(Array("default"))
    else throw new NoSuchNamespaceException(namespace)
  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] =
    if (namespace.isEmpty || namespace.sameElements(Array("default")))
      util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces are implicit")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces are implicit")
  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces are implicit")
}

/** One catalog-resolved snapshot table, pinned to a single committed
  * version at load time (current, `VERSION AS OF`, or `TIMESTAMP AS
  * OF`). SELECT goes through the [[V1Scan]] bridge to
  * [[SnapshotRelation.readSql]]; `DELETE FROM ... WHERE` goes through
  * Spark's native [[SupportsDelete]] path to
  * [[SnapshotUpsert.deleteWhere]] when every conjunct translates
  * (otherwise Spark refuses the statement — never a partial delete). */
final class GraftTable(tableName: String, val dir: String,
    val pinVersion: Option[Long], val pinAsOfMs: Option[Long])
  extends Table with SupportsRead with SupportsDelete {

  private val spark = SparkSession.active

  /** The version pin and its schema: resolved ONCE at load so
    * planning, scan, and schema all speak about the same manifest. */
  private val (pinned: Long, pinnedSchema: StructType) =
    SnapshotUpsert.resolvePin(spark, dir, pinVersion, pinAsOfMs).getOrElse(
      sys.error(s"graft catalog: no committed version of $tableName " +
        s"satisfies the pin (version=$pinVersion, asOfMs=$pinAsOfMs) — " +
        "retention may have dropped it; see SnapshotUpsert.history"))

  override def name(): String = tableName
  override def version(): String = pinned.toString

  override def schema: StructType = pinnedSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("location", dir)
    m.put("version", pinned.toString)
    // the pinned manifest's recorded layout + table props, so SHOW
    // TBLPROPERTIES / DESCRIBE EXTENDED answer "how is this table
    // laid out" without the Scala API (one extra manifest read, only
    // on the DESCRIBE-style paths that call properties())
    SnapshotUpsert.describeVersion(spark, dir, pinned)
      .foreach { case (k, v) => m.put(k, v) }
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new GraftScanBuilder(spark, dir, pinned, schema)

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftFilters.toColumn(f).nonEmpty)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(pinVersion.isEmpty && pinAsOfMs.isEmpty,
      "graft catalog: DELETE against a time-travelled table is not a " +
        "thing — committed versions are immutable")
    val cond = filters.flatMap(GraftFilters.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    SnapshotUpsert.deleteWhere(spark, dir, cond)
  }

  // Spark's DELETE path actually negotiates the V2 predicate flavor,
  // and SupportsDelete's DEFAULT V2-to-V1 bridge drops every predicate
  // the narrow V1 Filter algebra cannot state (`cnt % 7 = 0` refused
  // the whole statement — caught by the q_snapshot_catalog gate's
  // first real run). General V2 predicates round-trip losslessly
  // through Spark's own SQL builder instead: build the predicate's
  // SQL text, parse it back as a Column, and hand it to deleteWhere —
  // the predicate-DML path evaluates it exactly; only genuinely
  // unbuildable predicates refuse the statement (never partially).
  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean = predicates.forall(p => GraftFilters.v2ToColumn(p).nonEmpty)

  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    require(pinVersion.isEmpty && pinAsOfMs.isEmpty,
      "graft catalog: DELETE against a time-travelled table is not a " +
        "thing — committed versions are immutable")
    val cond = predicates.flatMap(GraftFilters.v2ToColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    SnapshotUpsert.deleteWhere(spark, dir, cond)
  }
}

private[catalog] final class GraftScanBuilder(spark: SparkSession,
    dir: String, version: Long, fullSchema: StructType)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // keep the translatable conjuncts for INNER skipping, but report
    // every filter residual — Spark re-applies them above the scan, so
    // a translation gap can cost reads, never rows
    pushed = filters.filter(f => GraftFilters.toColumn(f).nonEmpty)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftV1Scan(spark, dir, version, required, pushed)
}

/** The V2-to-V1 bridge scan: `buildScan` materializes the pinned
  * [[SnapshotRelation.readSql]] relation with the pushed conjuncts
  * re-stated (file skipping happens in the INNER plan's FileIndex) and
  * the required columns selected (column pruning reaches the inner
  * parquet scan). `needConversion = false` hands Spark the inner
  * plan's InternalRows directly — no external-Row round trip. */
private[catalog] final class GraftV1Scan(spark: SparkSession,
    dir: String, version: Long, required: StructType,
    pushed: Array[Filter]) extends V1Scan {

  override def readSchema(): StructType = required

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] = {
        val base = SnapshotRelation.readSql(spark, dir,
          version = Some(version))
        val filtered = pushed.flatMap(GraftFilters.toColumn)
          .foldLeft(base)((df, c) => df.where(c))
        val pruned = filtered.select(
          required.fieldNames.map(col).toSeq: _*)
        pruned.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
          .queryExecution.toRdd.asInstanceOf[RDD[Row]]
      }
    }.asInstanceOf[T]
  }
}

/** V1 `sources.Filter` -> `Column` translation for the catalog's scan
  * and delete paths. None = not translatable (the caller degrades:
  * scans skip less, deletes are refused whole). */
object GraftFilters {

  /** General V2 predicate -> Column, via Spark's own SQL builder
    * (lossless for everything the builder can print — arithmetic,
    * CASE, string ops — far past the V1 Filter algebra). None = the
    * builder cannot express it; callers refuse whole. */
  def v2ToColumn(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[Column] =
    try Some(org.apache.spark.sql.functions.expr(
      new org.apache.spark.sql.connector.util.V2ExpressionSQLBuilder()
        .build(p)))
    catch { case _: Exception => None }

  def toColumn(f: Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case sources.Not(c) => toColumn(c).map(!_)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
