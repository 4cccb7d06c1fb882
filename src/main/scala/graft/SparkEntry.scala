package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-module registries ([[QueryDef]]); each
  * entry pairs a Spark implementation with a DuckDB oracle where the
  * semantics are SQL-expressible.
  */
object SparkEntry {

  val registry: Seq[QueryDef] =
    CoreQueries.all ++ FsmQueries.all ++ AdvisoryQueries.all ++
      DataOpsQueries.all ++ AnnQueries.all ++ AnalyticsQueries.all ++
      CorpusQueries.all ++ SqlBreadthQueries.all ++ ClassifierQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_advisory_merge")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
