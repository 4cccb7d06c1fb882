package graft.ingest

import graft.io.TableIO
import graft.schemas.AdvisorySchemas
import org.apache.spark.sql.{DataFrame, SparkSession}

/** PostgreSQL override-table ingest (reference:
  * src/advisory_pipeline/ingest/fetch/pg_tables/fetch.py:10-53): JDBC
  * read (empty fallback when the table is missing), cast-projection to
  * the declared schema, staged to parquet, registered as a view.
  *
  * For scale, pass `partitionColumn`/bounds so the JDBC read fans out
  * across executors instead of a single connection. */
object PostgresSource {

  def ingest(
      spark: SparkSession,
      url: String,
      table: String,
      properties: java.util.Properties,
      stagingPath: String,
      runId: String,
      viewName: String = "not_applicable_cves",
      partitions: Int = 1,
  ): DataFrame = {
    val df = TableIO.readJdbc(spark, url, table,
      AdvisorySchemas.notApplicableCves, properties)
    val outputPath = s"$stagingPath/run_id=$runId/sources/$viewName"
    TableIO.writeTable(df, outputPath, AdvisorySchemas.notApplicableCves,
      partitions = partitions)
    val back = TableIO.readTable(spark, outputPath,
      AdvisorySchemas.notApplicableCves)
    back.createOrReplaceGlobalTempView(viewName)
    back
  }
}
