package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** S12: raw single-object file sink (fetched JSON bodies, manifests,
  * small text/CSV artifacts) through the Hadoop FileSystem API — ONE
  * code path for `file://`, `hdfs://`, and `s3a://` URIs, replacing
  * the reference's parallel local-file and boto3 implementations
  * (reference: ap/pipeline_libs/local/__init__.py:10-135,
  * ap/pipeline_libs/aws/__init__.py:10-138; declared there but never
  * called by any pipeline — implemented here for surface completeness).
  *
  * Deliberately a DRIVER-side write of one small object: a single
  * fetched API body must not become a distributed job (the reference's
  * `sc.parallelize([content], 1).saveAsTextFile` costs a job, a task,
  * and a directory with `_SUCCESS` markers per file).
  */
object RawFileSink {

  def writeBytes(spark: SparkSession, bytes: Array[Byte], path: String,
      overwrite: Boolean = true): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, overwrite)
    try out.write(bytes) finally out.close()
  }

  def writeString(spark: SparkSession, content: String, path: String,
      overwrite: Boolean = true): Unit =
    writeBytes(spark, content.getBytes(StandardCharsets.UTF_8), path, overwrite)

  /** Round-trip read (the reference's libs pair read/write the same way). */
  def readString(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }
}
