package graft.tools

import graft.streaming.{ClusterLayout, SnapshotRelation, SnapshotUpsert}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-scale rehearsal for the z-order clustered layout
  * ([[ClusterLayout]]) — the measured version of the multi-dimensional
  * clustering trade before trusting it at 100 TB: write the SAME
  * latest-state table twice (linear (ts, tenant) sort vs Morton
  * interleave, identical file-size cap), then compare, per layout,
  * how many files the manifest keeps and how long the read takes for
  *   (a) a time-window box (the dimension a linear sort owns),
  *   (b) a tenant-slice box (the dimension it is blind on), and
  *   (c) the correlated time x tenant box (the case z-order exists
  *       for).
  * Kept counts come from the planner's own decision (the relation's
  * file index under a real WHERE), not a simulation; times are the
  * full collect through the SQL relation.
  *
  * Args: [rows] [nBuckets] [filesPerBucket]. Prints one JSON line. */
object ZOrderScale {

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nBuckets = args.lift(1).map(_.toInt).getOrElse(16)
    val filesPerBucket = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("graft-zorder-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthetic but adversarial shape: ts and tenant are INDEPENDENT
    // (the worst case for a linear (ts, tenant) sort — tenant order is
    // pure noise inside every ts run), with tenant skew so equi-depth
    // ranks matter. day buckets the table; ts spans 64 days.
    val days = 64L
    val tenants = 4096L
    val base = spark.range(rows)
      .select(
        col("id"),
        (col("id") % days).as("dayN"),
        // ts uniform inside the day
        (col("id") % days * 86400L + pmod(xxhash64(col("id")), lit(86400L)))
          .as("ts"),
        // zipf-ish tenant skew via hash-of-hash folding
        pmod(xxhash64(col("id") + 7L), lit(tenants))
          .bitwiseAND(pmod(xxhash64(col("id") + 13L), lit(tenants)))
          .as("tenant"))
      .select(col("id"), concat(lit("d"), col("dayN")).as("day"),
        col("ts"), col("tenant"))
    val maxRows = math.max(1L, rows / nBuckets / filesPerBucket)

    def build(dir: String, layout: String): Double = Timing.secs {
      SnapshotUpsert.upsertBatchSnapshot(base, dir,
        keys = Seq("day", "id"), orderCol = "", nBuckets = nBuckets,
        bucketCols = Seq("day"),
        props = Map(
          SnapshotUpsert.ClusterColsProp -> "ts,tenant",
          ClusterLayout.LayoutProp -> layout,
          ClusterLayout.MaxFileRowsProp -> maxRows.toString))
    }

    val linDir = java.nio.file.Files
      .createTempDirectory("graft-zscale-lin").toString
    val zDir = java.nio.file.Files
      .createTempDirectory("graft-zscale-z").toString
    val linBuild = build(linDir, "linear")
    val zBuild = build(zDir, "zorder")

    def totalFiles(dir: String): Int =
      SnapshotRelation.totalFiles(spark, dir)

    // boxes: 4-day time window; 1/16 tenant slice; their intersection
    val tsLo = 16L * 86400L; val tsHi = 20L * 86400L - 1L
    val tnLo = 256L; val tnHi = 511L
    def tBox(d: DataFrame) = d.where(col("ts") >= tsLo && col("ts") <= tsHi)
    def nBox(d: DataFrame) =
      d.where(col("tenant") >= tnLo && col("tenant") <= tnHi)
    def tnBox(d: DataFrame) = nBox(tBox(d))

    def scanFiles(p: org.apache.spark.sql.execution.SparkPlan): Long =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scanFiles(s.plan)
      }.sum

    def measure(dir: String, p: DataFrame => DataFrame)
        : (Long, Long, Double) = {
      val q = p(SnapshotRelation.readSql(spark, dir))
      var n = 0L
      val secs = Timing.secs { n = q.count() }
      // planner's kept decision for the same predicates, via the scan
      // metric of THE DATASET'S OWN execution — count()/foreach build
      // a derived QueryExecution whose run leaves q2's plan metrics
      // untouched (zeros); only collect() on a projected q2 executes
      // the plan the metric hangs on
      val q2 = p(SnapshotRelation.readSql(spark, dir)).select(col("id"))
      q2.collect()
      val kept = q2.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => scanFiles(a.executedPlan)
        case other => scanFiles(other)
      }
      (kept, n, secs)
    }

    def audit(dir: String): Map[String, Any] = {
      val (tK, tN, tS) = measure(dir, tBox)
      val (nK, nN, nS) = measure(dir, nBox)
      val (bK, bN, bS) = measure(dir, tnBox)
      Map("files" -> totalFiles(dir),
        "time_box" -> Map("kept" -> tK, "rows" -> tN, "secs" -> tS),
        "tenant_box" -> Map("kept" -> nK, "rows" -> nN, "secs" -> nS),
        "both_box" -> Map("kept" -> bK, "rows" -> bN, "secs" -> bS))
    }

    val lin = audit(linDir)
    val z = audit(zDir)
    def j(m: Any): String = m match {
      case mm: Map[_, _] => mm.map { case (k, v) => s""""$k":${j(v)}""" }
        .mkString("{", ",", "}")
      case d: Double => f"$d%.2f"
      case x => x.toString
    }
    // rows must agree between layouts — the sort is never semantic
    println(s"""{"metric":"zorder_scale","rows":$rows,""" +
      s""""buckets":$nBuckets,"maxFileRows":$maxRows,""" +
      s""""build_linear_s":${f"$linBuild%.1f"},""" +
      s""""build_zorder_s":${f"$zBuild%.1f"},""" +
      s""""linear":${j(lin)},"zorder":${j(z)}}""")
    spark.stop()
  }
}
