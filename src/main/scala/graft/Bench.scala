package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query end to end and prints
  * ONE JSON line. Queries execute through the `noop` sink rather than
  * `count()` — a count lets Catalyst prune every expression not needed
  * for the row count, which would time a different (cheaper) plan than
  * the one users run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM + file-system metadata so the first timed query does
    // not absorb session startup.
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()

    def runOnce(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }

    // Steady-state methodology: one untimed warm pass (JIT + codegen
    // compilation + file-footer caches), then best of two timed passes
    // (the box carries background load; min-of-n is the standard
    // defense). Cold single-run numbers vary 3x on the same plan.
    def execute(name: String): Double = {
      runOnce(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        runOnce(name)
        (System.nanoTime() - t0) / 1e9
      }
      times.min
    }

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> execute(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
