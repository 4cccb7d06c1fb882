package graft.tools

import graft.io.TableIO
import graft.pipeline.AdvisoryMerge
import graft.queries.AdvisoryQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The OTHER half of the round-7 verdict's task #5: the bucketed merge
  * is proven shuffle-free at sf10/sf100 on `local[32]` — one JVM, where
  * "no shuffle" never actually crosses a process boundary. This
  * rehearsal reruns the exact q_advisory_merge computation under
  * `local-cluster[N, cores, mem]`: a real standalone master + worker
  * with N SEPARATE executor JVMs, so every shuffle byte is a genuine
  * inter-process block fetch and the bucketed claim is tested against
  * real executor boundaries (does each single-file bucket scan as one
  * task? does the co-bucketed SMJ still need zero Exchanges when its
  * inputs live in different JVMs?).
  *
  * Evidence reported per variant: wall (min of 2 after warm), shuffle
  * WRITE and READ bytes (read bytes are actual cross-JVM fetches here),
  * hash-Exchange count, and a driver-side checksum proving the
  * bucketed result is row-identical to the unbucketed one.
  *
  * Usage (SPARK_HOME must point at a real distribution so the worker
  * can fork executor JVMs; SPARK_WORKER_DIR keeps executor work dirs
  * inside the repo):
  *   SPARK_HOME=/opt/spark SPARK_WORKER_DIR=target/lc-work \
  *     sbt "runMain graft.tools.LocalClusterMerge <sfDir> [buckets] [execs]"
  */
object LocalClusterMerge {
  def main(args: Array[String]): Unit = {
    val sfDir = new java.io.File(args.headOption.getOrElse("/root/testdata/sf0.1"))
      .getAbsolutePath
    val buckets = args.lift(1).map(_.toInt).getOrElse(16)
    val execs = args.lift(2).map(_.toInt).getOrElse(4)
    require(sys.env.contains("SPARK_HOME"),
      "local-cluster mode forks executor JVMs via $SPARK_HOME/bin/spark-class")
    // executors are fresh JVMs with only the distribution jars — give
    // them the compiled graft classes (codegen'd plans reference our
    // Expression classes)
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .master(s"local-cluster[$execs,4,4096]")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "target/bucketed-wh-lc")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("echo_lc", "norm_lc", "prod_lc").foreach { n =>
      val dir = java.nio.file.Paths.get("target/bucketed-wh-lc", n)
      if (java.nio.file.Files.exists(dir))
        org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
    val t = new StageTotals
    spark.sparkContext.addSparkListener(t)
    def settle(): Unit =
      org.apache.spark.graftspark.ListenerDrain.drain(spark.sparkContext)
    def mb(b: Long): String = f"${b / 1e6}%.1f MB"

    def timedRun(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def measure(label: String, mk: => DataFrame): (Double, Long, Long) = {
      val df = mk
      timedRun(df) // warm
      val s1 = timedRun(df)
      settle(); t.reset()
      val s2 = timedRun(df)
      settle()
      val (shW, shR) = (t.shuffleWrite, t.shuffleRead)
      println(f"[lc-merge] $label%-24s min=${math.min(s1, s2)}%6.2f s " +
        s"shuffleWrite=${mb(shW)} shuffleRead(cross-JVM)=${mb(shR)}")
      (math.min(s1, s2), shW, shR)
    }
    // one driver-side checksum over every output column: row-order
    // independent, catches any divergence between the two plans (sum
    // through unbounded DECIMAL — a 64-bit sum of 5M hashes overflows
    // under ANSI mode)
    def checksum(df: DataFrame): (Long, BigDecimal) = {
      val row = df
        .select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(count(lit(1)).as("n"),
          sum(col("h").cast("decimal(38,0)")).as("s"))
        .head()
      (row.getLong(0), BigDecimal(row.getDecimal(1)))
    }

    val (echo, norm, prod) = AdvisoryQueries.mergeInputs(spark, sfDir)
    val tie = AdvisoryQueries.mergeTiebreak
    def unbucketed = AdvisoryMerge.mapNewInfo(echo, norm, prod, tiebreak = tie,
      sorted = false)
    val (_, _, _) = measure("unbucketed merge", unbucketed)
    // count AFTER the first job so registration has settled
    val nExec = spark.sparkContext.getExecutorMemoryStatus.size - 1
    println(s"[lc-merge] executors up: $nExec (requested $execs), data=$sfDir")

    // sorted single-file buckets (the production layout from the sf100
    // rehearsal): repartition to numBuckets tasks so each bucket is
    // one sorted file
    val w0 = System.nanoTime()
    def sortedWrite(df: DataFrame, name: String, keys: Seq[String]): Unit =
      TableIO.writeBucketed(df.repartition(buckets, keys.map(col): _*),
        name, keys, buckets, sortCols = keys)
    sortedWrite(echo, "echo_lc", Seq("cve_id", "package_name"))
    sortedWrite(norm, "norm_lc", Seq("cve_id", "package"))
    sortedWrite(prod, "prod_lc", Seq("cve_id", "package"))
    println(f"[lc-merge] bucketed+sorted write    ${(System.nanoTime() - w0) / 1e9}%6.2f s (once)")

    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    def bucketed = AdvisoryMerge.mapNewInfo(spark.table("echo_lc"),
      spark.table("norm_lc"), spark.table("prod_lc"), tiebreak = tie,
      sorted = false)
    val (_, buShW, buShR) = measure("bucketed merge", bucketed)

    val plan = bucketed.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val (nU, sU) = checksum(unbucketed)
    val (nB, sB) = checksum(bucketed)
    val same = nU == nB && sU == sB
    println(s"[lc-merge] hash Exchanges in bucketed plan: $exchanges")
    println(s"[lc-merge] result parity unbucketed vs bucketed: rows $nU/$nB " +
      s"checksum ${if (same) "IDENTICAL" else s"DIFFER ($sU vs $sB)"}")
    println(s"[lc-merge] SUMMARY execs=$nExec buckets=$buckets " +
      s"bucketedShuffleWrite=${mb(buShW)} bucketedCrossJvmRead=${mb(buShR)} " +
      s"exchanges=$exchanges parity=${if (same) "OK" else "FAIL"}")
    spark.stop()
    if (!same) sys.exit(1)
  }
}
