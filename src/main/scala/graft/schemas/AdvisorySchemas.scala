package graft.schemas

import org.apache.spark.sql.types._

/** All fixed table schemas of the advisory pipeline.
  *
  * Every read and write in this engine enforces one of these — schemaless
  * I/O is an error, matching the reference's universal schema-enforcement
  * idiom (reference: src/advisory_pipeline/pipeline_libs/spark/
  * spark_utils.py:171-172 and the schema modules under ingest/schemas,
  * enrichment/schemas, state_machine/schemas).
  *
  * Deliberate quirks preserved from the reference (SURVEY §7.4):
  *   - `enrichment_timestamp` / `nvd_query_timestamp` are ISO-8601
  *     STRINGS compared lexicographically, not TimestampType; only the
  *     enrichment cache uses a real timestamp.
  *   - In [[normalizedEnrichment]], `internal_status` holds the echo
  *     STATE and `status` holds the customer-facing EXPLANATION
  *     (column pun, re-aliased downstream).
  */
object AdvisorySchemas {

  /** Echo advisory master list (ingest/schemas/echo_advisory_schema.py:8-14). */
  val echoAdvisory: StructType = StructType(Seq(
    StructField("package_name", StringType, nullable = true),
    StructField("cve_id", StringType, nullable = false),
    StructField("fixed_version", StringType, nullable = true),
  ))

  /** Manual not-applicable overrides, from PostgreSQL
    * (ingest/schemas/not_applicable_schema.py:9-17). */
  val notApplicableCves: StructType = StructType(Seq(
    StructField("cve_id", StringType, nullable = false),
    StructField("package", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("fixed_version", StringType, nullable = true),
    StructField("internal_status", StringType, nullable = false),
  ))

  /** Raw NVD enrichment rows (enrichment/schemas/raw_nvd_schema.py:9-25). */
  val rawNvd: StructType = StructType(Seq(
    StructField("cve_id", StringType, nullable = false),
    StructField("package", StringType, nullable = true),
    StructField("nvd_found", BooleanType, nullable = false),
    StructField("nvd_fixed_version", StringType, nullable = true),
    StructField("nvd_status", StringType, nullable = true),
    StructField("nvd_query_timestamp", StringType, nullable = false),
  ))

  /** Unified enrichment schema (enrichment/schemas/noramlized_schema.py:3-13).
    * NOTE the pun: `internal_status` = echo state, `status` = explanation. */
  val normalizedEnrichment: StructType = StructType(Seq(
    StructField("cve_id", StringType, nullable = true),
    StructField("package", StringType, nullable = true),
    StructField("fixed_version", StringType, nullable = true),
    StructField("internal_status", StringType, nullable = true),
    StructField("status", StringType, nullable = true),
    StructField("priority", IntegerType, nullable = true),
    StructField("enrichment_timestamp", StringType, nullable = true),
  ))

  /** Normalized enrichment as read across the `enrichment_source=`
    * partition dir (state_machine/pipeline.py:20-34). */
  val normalizedEnrichmentWithSource: StructType =
    StructType(normalizedEnrichment.fields :+
      StructField("enrichment_source", StringType, nullable = true))

  /** Production / processed state-machine table
    * (state_machine/schemas/state.py:22-45). */
  val cveStateMachine: StructType = StructType(Seq(
    StructField("cve_id", StringType, nullable = false),
    StructField("package", StringType, nullable = true),
    StructField("status", StringType, nullable = true),
    StructField("previous_status", StringType, nullable = true),
    StructField("fixed_version", StringType, nullable = true),
    StructField("internal_status", StringType, nullable = true),
    StructField("data_source", StringType, nullable = true),
    StructField("priority", IntegerType, nullable = true),
    StructField("enrichment_timestamp", StringType, nullable = true),
    StructField("transition_valid", BooleanType, nullable = true),
    StructField("transition_reason", StringType, nullable = true),
    StructField("change_type", StringType, nullable = true),
  ))

  /** Incremental enrichment cache, parquet partitioned by `source_name`
    * (enrichment/schemas/cache_schema.py:9-16). `package_name` here vs
    * `package` elsewhere — aliased at the join (enrichment/cache.py:85-88). */
  val enrichmentCache: StructType = StructType(Seq(
    StructField("cve_id", StringType, nullable = false),
    StructField("package_name", StringType, nullable = true),
    StructField("source_name", StringType, nullable = false),
    StructField("last_accessed", TimestampType, nullable = false),
  ))
}
