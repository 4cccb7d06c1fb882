package graft.schemas

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Structural schema assertions, mirroring the reference's own schema
  * test module (reference: test/test_schemas.py — field names, types,
  * nullability per declared schema). */
class AdvisorySchemasSpec extends AnyFunSuite {

  def fields(s: StructType): Seq[(String, DataType, Boolean)] =
    s.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq

  test("echo advisory schema") {
    assert(fields(AdvisorySchemas.echoAdvisory) == Seq(
      ("package_name", StringType, true),
      ("cve_id", StringType, false),
      ("fixed_version", StringType, true)))
  }

  test("not-applicable override schema") {
    assert(fields(AdvisorySchemas.notApplicableCves) == Seq(
      ("cve_id", StringType, false),
      ("package", StringType, false),
      ("status", StringType, false),
      ("fixed_version", StringType, true),
      ("internal_status", StringType, false)))
  }

  test("raw NVD schema") {
    assert(fields(AdvisorySchemas.rawNvd) == Seq(
      ("cve_id", StringType, false),
      ("package", StringType, true),
      ("nvd_found", BooleanType, false),
      ("nvd_fixed_version", StringType, true),
      ("nvd_status", StringType, true),
      ("nvd_query_timestamp", StringType, false)))
  }

  test("normalized enrichment schema keeps the column pun and string timestamps") {
    val f = fields(AdvisorySchemas.normalizedEnrichment)
    assert(f.map(_._1) == Seq("cve_id", "package", "fixed_version",
      "internal_status", "status", "priority", "enrichment_timestamp"))
    // enrichment_timestamp is a lexicographically-ordered STRING by
    // design (SURVEY §7.4) — do not "fix" to TimestampType
    assert(f.find(_._1 == "enrichment_timestamp").get._2 == StringType)
    assert(f.find(_._1 == "priority").get._2 == IntegerType)
    assert(fields(AdvisorySchemas.normalizedEnrichmentWithSource).last ==
      ("enrichment_source", StringType, true))
  }

  test("state machine schema: 12 columns in upsert order") {
    val f = fields(AdvisorySchemas.cveStateMachine)
    assert(f.map(_._1) == Seq("cve_id", "package", "status",
      "previous_status", "fixed_version", "internal_status", "data_source",
      "priority", "enrichment_timestamp", "transition_valid",
      "transition_reason", "change_type"))
    assert(f.head == ("cve_id", StringType, false))
    assert(f.find(_._1 == "transition_valid").get._2 == BooleanType)
  }

  test("cache schema: real timestamp, package_name naming") {
    assert(fields(AdvisorySchemas.enrichmentCache) == Seq(
      ("cve_id", StringType, false),
      ("package_name", StringType, true),
      ("source_name", StringType, false),
      ("last_accessed", TimestampType, false)))
  }
}
