package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Z-order (Morton interleaved) clustered writes ([[ClusterLayout]]):
  * identical images under either layout, and the measured pruning
  * trade — a linear (x, y) sort serves x-boxes perfectly and y-boxes
  * not at all; the z-order layout serves BOTH, each file covering a
  * small rectangle of the (x, y) space that the ordinary manifest
  * range stats then prune. Also pins [[ClusterLayout.MaxFileRowsProp]]
  * splitting one bucket's rewrite into several stat-bearing runs —
  * the knob that turns a sort into file-level skipping. */
class ZOrderSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-zorder").toString

  /** 64x64 grid: id = x*64+y, one bucket, 16 files of 256 rows. */
  private def writeGrid(dir: String, layout: String): Unit = {
    import spark.implicits._
    val rows = for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x * 64L + y, x, y)
    SnapshotUpsert.upsertBatchSnapshot(
      rows.toDF("id", "x", "y"), dir, Seq("id"), "",
      nBuckets = 1, keepVersions = 10,
      props = Map(
        SnapshotUpsert.ClusterColsProp -> "x,y",
        ClusterLayout.LayoutProp -> layout,
        ClusterLayout.MaxFileRowsProp -> "256"))
  }

  private def collectScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec => Seq(f)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectScans(s.plan)
    }.flatten

  private def scannedFiles(d: DataFrame): Long = {
    d.collect()
    val plan = d.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = collectScans(plan)
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  private def grid(d: DataFrame): Set[(Long, Long, Long)] =
    d.select("id", "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("maxFileRows splits a bucket's rewrite into stat-bearing runs " +
      "and both layouts serve the identical image") {
    val linDir = tmp(); val zDir = tmp()
    writeGrid(linDir, "linear")
    writeGrid(zDir, "zorder")
    val expect = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x * 64L + y, x, y)).toSet
    assert(grid(SnapshotRelation.readSql(spark, linDir)) == expect)
    assert(grid(SnapshotRelation.readSql(spark, zDir)) == expect)
    for (dir <- Seq(linDir, zDir)) {
      val root = new Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cur = SnapshotUpsert.currentSnapshot(fs, root).get
      val n = cur.files(0).size
      assert(n >= 12 && n <= 20, s"expected ~16 files of 256 rows, got $n")
      // every staged run carries stats for both clustering columns
      assert(cur.files(0).forall(rel =>
        cur.stats(rel).contains("x") && cur.stats(rel).contains("y")))
    }
  }

  test("the measured trade: linear owns x-boxes, z-order serves BOTH " +
      "dimensions — y-boxes and 2D boxes open a fraction of the files") {
    val linDir = tmp(); val zDir = tmp()
    writeGrid(linDir, "linear")
    writeGrid(zDir, "zorder")
    def files(dir: String): Int = {
      val root = new Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      SnapshotUpsert.currentSnapshot(fs, root).get.files(0).size
    }
    def kept(dir: String, p: DataFrame => DataFrame,
        expectRows: Int): Long = {
      val q = p(SnapshotRelation.readSql(spark, dir))
      assert(q.count() == expectRows) // the answer, not just the I/O
      scannedFiles(q)
    }
    val total = files(linDir).toLong
    def xBox(d: DataFrame) = d.where(col("x") >= 8L && col("x") <= 11L)
    def yBox(d: DataFrame) = d.where(col("y") >= 8L && col("y") <= 11L)
    def xyBox(d: DataFrame) = d.where(col("x") >= 8L && col("x") <= 11L &&
      col("y") >= 8L && col("y") <= 11L)

    // linear: x-stripes — perfect on x, blind on y
    val linX = kept(linDir, xBox, 4 * 64)
    val linY = kept(linDir, yBox, 4 * 64)
    assert(linX <= 2, s"linear x-box should be ~1 file, got $linX")
    assert(linY == total, s"linear y-box must scan everything, got $linY")

    // z-order: rectangles — both dimensions prune
    val zX = kept(zDir, xBox, 4 * 64)
    val zY = kept(zDir, yBox, 4 * 64)
    val zXY = kept(zDir, xyBox, 4 * 4)
    assert(zY < total / 2,
      s"z-order y-box must prune (got $zY of $total)")
    assert(zX < total / 2,
      s"z-order x-box must prune (got $zX of $total)")
    assert(zXY <= math.min(zX, zY),
      s"2D box keeps the intersection ($zXY vs $zX/$zY)")
    // and the correctness of every boxed result was asserted in kept()
  }

  test("a typo'd layout value or a one-column zorder fails loudly " +
      "instead of silently writing linear") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("id", "x", "y").withColumn("kb",
      org.apache.spark.sql.functions.lit(0))
    val e1 = intercept[IllegalArgumentException] {
      ClusterLayout.sorted(df, Seq("x", "y"),
        Map(ClusterLayout.LayoutProp -> "ZOrder"))
    }
    assert(e1.getMessage.contains("zorder"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      ClusterLayout.sorted(df, Seq("x"),
        Map(ClusterLayout.LayoutProp -> "zorder"))
    }
    assert(e2.getMessage.contains("2 clustering columns"), e2.getMessage)
  }

  test("zValue orders nulls first, survives constant and skewed " +
      "columns, and works for non-numeric types") {
    import spark.implicits._
    // skew: 90% of x mass on one value; y uniform strings
    val df = ((0 until 900).map(i => (Some(7L), f"s${i % 30}%02d")) ++
      (0 until 100).map(i => (Some(i.toLong + 100L), f"s${i % 30}%02d")) ++
      Seq((Option.empty[Long], "s00")))
      .toDF("x", "y")
    val z = df.select(ClusterLayout.zValue(df, Seq("x", "y")).as("z"),
      col("x"), col("y"))
    val rows = z.collect()
    assert(rows.forall(_.getLong(0) >= 0L))
    // the null-x row ranks at the bottom of its y-slice: its z has no
    // x bits set, so it cannot exceed any same-y row's z
    val nullZ = rows.filter(_.isNullAt(1)).map(_.getLong(0)).head
    val sameY = rows.filter(r => !r.isNullAt(1) && r.getString(2) == "s00")
      .map(_.getLong(0))
    assert(sameY.forall(_ >= nullZ))
    // constant column degrades to rank 0 everywhere, never throws
    val const = ((0 until 50).map(i => (1L, i.toLong))).toDF("x", "y")
    assert(const.select(ClusterLayout.zValue(const, Seq("x", "y")).as("z"))
      .collect().forall(_.getLong(0) >= 0L))
  }
}
