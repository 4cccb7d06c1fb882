package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** The `private[sql]` door a custom [[FileIndex]]-backed relation has
  * to walk through: `HadoopFsRelation`/`LogicalRelation` live in
  * `org.apache.spark.sql.execution.datasources` and the only way to
  * surface a hand-built logical plan as a user DataFrame is
  * `Dataset.ofRows`, which is `private[sql]`. This object lives under
  * `org.apache.spark.sql` purely to reach them — the same approach the
  * open-source Delta Lake takes for its `TahoeLogFileIndex` relation
  * (a transaction-log-backed `FileIndex` handed to a plain
  * `HadoopFsRelation` over `ParquetFileFormat`, so every downstream
  * optimization — filter pushdown into parquet, column pruning,
  * whole-stage codegen over the scan — is stock Spark). Nothing else
  * private is touched.
  */
object RelationShim {

  /** Wrap a file index + schema as a parquet-backed DataFrame relation.
    * The heavy lifting (vectorized parquet reads, row-group pushdown,
    * column pruning, codegen) is Spark's own `ParquetFileFormat`; the
    * index only decides WHICH files the scan sees. */
  def parquetRelation(spark: SparkSession, index: FileIndex,
      dataSchema: StructType,
      options: Map[String, String] = Map.empty): DataFrame = {
    val rel = HadoopFsRelation(index, new StructType(), dataSchema, None,
      new ParquetFileFormat, options)(spark)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      LogicalRelation(rel, isStreaming = false))
  }
}
