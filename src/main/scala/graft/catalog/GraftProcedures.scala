package graft.catalog

import graft.streaming.SnapshotUpsert
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.util.Collections

/** Table-maintenance STORED PROCEDURES for the graft catalog — the
  * operator actions the SQL-text surface deliberately keeps out of
  * DML, reachable as SQL-standard `CALL` statements (Spark 4's V2
  * `ProcedureCatalog`; the same shape as Iceberg's `system.*`
  * procedures, so a lakehouse operator's runbook translates 1:1):
  *
  *   - `CALL graft.system.maintain(table => 't')` — the one-call
  *     policy pass ([[SnapshotUpsert.maintain]]): overdue delta
  *     compaction, overfull-bucket splits, debris vacuum, one report.
  *   - `CALL graft.system.restore(table => 't', version => 7)` —
  *     rollback-as-forward-commit ([[SnapshotUpsert.restore]]).
  *   - `CALL graft.system.compact(table => 't', min_layers => 2)` —
  *     just the delta fold ([[SnapshotUpsert.compactDeltas]]).
  *   - `CALL graft.system.vacuum(table => 't', older_than_ms => ...)`
  *     — just the debris sweep ([[SnapshotUpsert.vacuum]]).
  *
  * Each procedure returns one result row (what happened — versions,
  * bucket ids, swept paths) through a driver-local scan: maintenance
  * reports are bounded driver-side metadata by construction, never
  * data. Parameters use the analyzer's own named-argument and
  * DEFAULT machinery, so `CALL` sites state only what they override. */
private[catalog] object GraftProcedures {

  /** The procedures, by lower-case name (namespace `system` or bare). */
  def load(name: String, dirOf: String => String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "maintain" => Some(new MaintainProcedure(dirOf))
      case "restore" => Some(new RestoreProcedure(dirOf))
      case "compact" => Some(new CompactProcedure(dirOf))
      case "vacuum" => Some(new VacuumProcedure(dirOf))
      case "history" => Some(new HistoryProcedure(dirOf))
      case _ => None
    }

  val names: Seq[String] =
    Seq("compact", "history", "maintain", "restore", "vacuum")

  // non-nullable argument decoders: InternalRow.getLong/getInt on a
  // null slot silently yield 0 — for a vacuum horizon that is the most
  // destructive value, for keep_versions it would GC every manifest
  private def str(r: InternalRow, i: Int, name: String): String = {
    require(!r.isNullAt(i), s"procedure argument '$name' must not be NULL")
    r.getUTF8String(i).toString
  }

  private def reqLong(r: InternalRow, i: Int, name: String): Long = {
    require(!r.isNullAt(i), s"procedure argument '$name' must not be NULL")
    r.getLong(i)
  }

  private def reqInt(r: InternalRow, i: Int, name: String): Int = {
    require(!r.isNullAt(i), s"procedure argument '$name' must not be NULL")
    r.getInt(i)
  }

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def result(schema: StructType, values: Any*)
      : java.util.Iterator[Scan] = {
    val row = InternalRow.fromSeq(values)
    Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = Array(row)
    }).iterator()
  }

  private abstract class GraftProcedure(procName: String,
      dirOf: String => String)
    extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def dir(r: InternalRow): String = dirOf(str(r, 0, "table"))
    protected def spark: SparkSession = SparkSession.active
    protected val tableParam: ProcedureParameter =
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog").build()
  }

  private final class MaintainProcedure(dirOf: String => String)
    extends GraftProcedure("maintain", dirOf) {
    override def description: String =
      "one maintenance pass: compact overdue delta layers, split " +
        "overfull buckets, vacuum debris; returns what happened"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("compact_min_layers", IntegerType)
        .defaultValue("4").comment("fold buckets with >= this many " +
          "pending delta layers; 0 disables").build(),
      ProcedureParameter.in("max_bucket_bytes", LongType)
        .defaultValue("CAST(NULL AS BIGINT)")
        .comment("split buckets past this many live bytes; NULL disables")
        .build(),
      ProcedureParameter.in("vacuum_older_than_ms", LongType)
        .defaultValue((7L * 24 * 3600 * 1000).toString)
        .comment("sweep unreferenced debris older than this; NULL " +
          "disables").build(),
      ProcedureParameter.in("keep_versions", IntegerType)
        .defaultValue("2").comment("retention window for the commits " +
          "the pass makes").build())
    private val out = StructType(Seq(
      StructField("compacted_buckets", StringType),
      StructField("split_buckets", StringType),
      StructField("vacuumed_paths", StringType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val rep = SnapshotUpsert.maintain(spark, dir(input),
        SnapshotUpsert.MaintenancePolicy(
          compactMinLayers = reqInt(input, 1, "compact_min_layers"),
          maxBucketBytes =
            if (input.isNullAt(2)) None else Some(input.getLong(2)),
          vacuumOlderThanMs =
            if (input.isNullAt(3)) None else Some(input.getLong(3)),
          keepVersions = reqInt(input, 4, "keep_versions")))
      result(out, utf8(rep.compacted.mkString(",")),
        utf8(rep.split.mkString(",")), utf8(rep.vacuumed.mkString(",")))
    }
  }

  private final class RestoreProcedure(dirOf: String => String)
    extends GraftProcedure("restore", dirOf) {
    override def description: String =
      "re-publish an earlier committed version's content at the head " +
        "as a NEW commit (zero data movement; history stays readable)"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("version", LongType)
        .comment("committed version to restore to " +
          "(see the table's history)").build(),
      ProcedureParameter.in("keep_versions", IntegerType)
        .defaultValue("2").build())
    private val out = StructType(Seq(
      StructField("restored_to_version", LongType),
      StructField("new_head_version", LongType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val d = dir(input)
      SnapshotUpsert.restore(spark, d, reqLong(input, 1, "version"),
        keepVersions = reqInt(input, 2, "keep_versions"))
      result(out, input.getLong(1),
        SnapshotUpsert.versions(spark, d).last)
    }
  }

  private final class CompactProcedure(dirOf: String => String)
    extends GraftProcedure("compact", dirOf) {
    override def description: String =
      "fold pending merge-on-read delta layers back into base files"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("min_layers", IntegerType)
        .defaultValue("1").build(),
      ProcedureParameter.in("keep_versions", IntegerType)
        .defaultValue("2").build())
    private val out = StructType(Seq(
      StructField("compacted_buckets", StringType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val ids = SnapshotUpsert.compactDeltas(spark, dir(input),
        minLayers = reqInt(input, 1, "min_layers"),
        keepVersions = reqInt(input, 2, "keep_versions"))
      result(out, utf8(ids.mkString(",")))
    }
  }

  private final class HistoryProcedure(dirOf: String => String)
    extends GraftProcedure("history", dirOf) {
    override def description: String =
      "the table's retained committed versions, newest first — the " +
        "restore / time-travel picker"
    override def parameters(): Array[ProcedureParameter] =
      Array(tableParam)
    private val out = StructType(Seq(
      StructField("version", LongType),
      StructField("commit_ts_ms", LongType),
      StructField("n_buckets", IntegerType),
      StructField("n_files", IntegerType),
      StructField("n_columns", IntegerType),
      StructField("n_delta_files", IntegerType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      // bounded by retention (keepVersions/keepAgeMs manifests), the
      // same driver-side metadata every commit already lists. NB the
      // local must NOT be named `rows`: inside the anon LocalScan that
      // name resolves to the method being overridden, and the
      // self-call compiles to an infinite tail-recursive loop.
      val hist = SnapshotUpsert.history(spark, dir(input))
        .orderBy(org.apache.spark.sql.functions.desc("version"))
        .collect()
        // Seq[Any], NOT Seq(...): mixed Long/Int elements unify by
        // NUMERIC WIDENING to Seq[Long], silently boxing the int
        // columns as Longs under an int schema (CCE at projection)
        .map(r => InternalRow.fromSeq(Seq[Any](r.getLong(0), r.getLong(1),
          r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))))
      Collections.singletonList[Scan](new LocalScan {
        override def readSchema(): StructType = out
        override def rows(): Array[InternalRow] = hist
      }).iterator()
    }
  }

  private final class VacuumProcedure(dirOf: String => String)
    extends GraftProcedure("vacuum", dirOf) {
    override def description: String =
      "sweep unreferenced crash debris older than the horizon"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("older_than_ms", LongType)
        .defaultValue((7L * 24 * 3600 * 1000).toString).build())
    private val out = StructType(Seq(
      StructField("deleted_paths", StringType)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val deleted = SnapshotUpsert.vacuum(spark, dir(input),
        reqLong(input, 1, "older_than_ms"))
      result(out, utf8(deleted.mkString(",")))
    }
  }
}
