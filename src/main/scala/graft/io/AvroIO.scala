package graft.io

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file I/O built directly on the public avro-core /
  * avro-mapred APIs bundled with the Spark distribution. The
  * spark-avro DATASOURCE module is not part of the distribution and
  * this build adds no dependencies, so `spark.read.format("avro")`
  * cannot resolve — but real corpora arrive as Avro drops, and the
  * underlying libraries are right there; this closes the last format
  * gap (PERF.md round-2 candidate list) without any new dependency.
  *
  * Scale posture: the read is `newAPIHadoopFile` over
  * `AvroKeyInputFormat`, so container files SPLIT at Avro sync markers
  * exactly as they would on a cluster (a 1 TB Avro drop parallelizes
  * with no pre-splitting step); the write fans out per partition
  * through `AvroKeyOutputFormat`. Records convert to/from rows at the
  * task boundary only; supported fields are the flat-primitive subset
  * (string/long/int/double/float/boolean/binary) — nested corpora
  * should land as parquet, Avro here is the interchange edge.
  */
object AvroIO {

  /** Avro schema JSON for a flat StructType. Nullable fields become
    * `["null", T]` unions — Avro's standard optional encoding. */
  def avroSchemaJson(schema: StructType, name: String = "row"): String = {
    def prim(dt: DataType): String = dt match {
      case StringType  => "\"string\""
      case LongType    => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType  => "\"double\""
      case FloatType   => "\"float\""
      case BooleanType => "\"boolean\""
      case BinaryType  => "\"bytes\""
      case other => throw new IllegalArgumentException(
        s"AvroIO supports flat primitive schemas; got $other")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name": "${f.name}", "type": $t}"""
    }.mkString(", ")
    s"""{"type": "record", "name": "$name", "fields": [$fields]}"""
  }

  /** Distributed Avro container write, one file per partition.
    * Overwrites `path` (same semantics as the parquet/ORC writers). */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(conf)
    if (fs.exists(target)) fs.delete(target, true)
    val job = Job.getInstance(conf)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(json))
    df.rdd.mapPartitions { rows =>
      // Schema is not Serializable — re-parse from the JSON string
      // inside the task
      val schema = new Schema.Parser().parse(json)
      rows.map { r =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          val v = r.get(i) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case x => x
          }
          rec.put(sparkSchema(i).name, v)
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Schema-enforced Avro read. Fields resolve by NAME against the
    * file's writer schema (the reader keeps working across field
    * reordering); a missing field or non-primitive type surfaces as a
    * task error, the same fail-fast posture as `TableIO.readTable`. */
  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable])
    val fields = schema.fields
    val rows = rdd.mapPartitions { it =>
      it.map { case (k, _) =>
        // convert BEFORE advancing: the record reader reuses the key
        val rec = k.datum()
        val vals = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          vals(i) = fromAvro(rec.get(fields(i).name))
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  private def fromAvro(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case other => other
  }
}
