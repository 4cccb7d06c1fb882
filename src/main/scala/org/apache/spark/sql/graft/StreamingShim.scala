package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` door a V1 streaming [[org.apache.spark.sql
  * .execution.streaming.Source]] has to walk through: `getBatch` must
  * return a DataFrame whose logical plan carries `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only constructor for that
  * is `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`,
  * which is `private[sql]`. This object lives under
  * `org.apache.spark.sql` purely to reach it — the same approach
  * Spark's own `FileStreamSource` and the open-source Delta Lake
  * `DeltaSource` take (both call `internalCreateDataFrame(...,
  * isStreaming = true)` from inside the sql package). Nothing else
  * private is touched; the planned RDD comes from the public
  * `QueryExecution.toRdd`.
  */
object StreamingShim {

  /** The batch plan of `df`, as the engine would execute it — lazy:
    * nothing runs until the streaming micro-batch does. */
  def toInternalRdd(df: org.apache.spark.sql.DataFrame): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd

  /** Wrap a planned RDD as a STREAMING DataFrame of `schema` — the
    * return shape `Source.getBatch` requires. */
  def streamingDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: RDD[InternalRow], schema: StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
