package graft.pipeline

import graft.SparkSpec
import graft.enrichment.{HttpTransport, NvdConfig}
import graft.schemas.AdvisorySchemas
import org.apache.spark.sql.Row

import java.nio.file.Files
import java.time.Instant
import java.util.concurrent.atomic.AtomicInteger

object AdvisoryPipelineSpec {
  val advisoryJson: String =
    """{
      |  "glibc": {"CVE-2024-1": {"fixed_version": "2.39"},
      |            "CVE-2024-2": {},
      |            "notacve": {"fixed_version": "9"}},
      |  "openssl": {"CVE-2024-3": {"fixed_version": ""},
      |              "CVE-2024-4": null},
      |  "badpkg": "notadict"
      |}""".stripMargin

  def nvdResponse(status: String, fixedExcl: Option[String]): String = {
    val cpe = fixedExcl.map(v => s"""{"versionEndExcluding": "$v"}""").getOrElse("{}")
    s"""{"vulnerabilities": [{"cve": {"vulnStatus": "$status",
       |  "configurations": [{"nodes": [{"cpeMatch": [$cpe]}]}]}}]}""".stripMargin
  }

  /** Top-level (serializable) stub — executors call it from
    * mapPartitions, so it must not capture the test suite. Calls are
    * counted in a static so the driver can assert on them. */
  val nvdCalls = new AtomicInteger(0)
  class StubTransport extends HttpTransport {
    def get(url: String, headers: Map[String, String]): (Int, String) =
      if (url.contains("data.json")) (200, advisoryJson)
      else {
        nvdCalls.incrementAndGet()
        if (url.contains("CVE-2024-3"))
          (200, nvdResponse("Analyzed", Some("3.0.14")))
        else (200, nvdResponse("Awaiting Analysis", None))
      }
  }
}

/** End-to-end golden test of the three-stage pipeline with a stubbed
  * transport (no network) — the behavioral coverage the reference's own
  * test suite lacks (it never executes a query; SURVEY §5). */
class AdvisoryPipelineSpec extends SparkSpec {
  import AdvisoryPipelineSpec._

  lazy val base: String = Files.createTempDirectory("advisory-e2e").toString

  def overridesDf = {
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row("cve-2024-2", "GLIBC", "not_applicable", null, "code_not_in_use"))
    spark.createDataFrame(rows, AdvisorySchemas.notApplicableCves)
  }

  test("run 1: bootstrap — all rows new, enrichment applied, cache written") {
    val transport = new StubTransport
    nvdCalls.set(0)
    val config = PipelineConfig.fromDefaults("run1", base)
    val prod = Pipelines.run(spark, config, transport, NvdConfig(partitions = 2),
      "http://stub", overridesDf, now = Instant.parse("2026-02-01T00:00:00Z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

    assert(prod.size == 4) // badpkg + notacve skipped
    val fixed1 = prod(("CVE-2024-1", "glibc"))
    assert(fixed1.getAs[String]("status") == "pending_upstream") // echo fix does not drive state
    assert(fixed1.getAs[String]("fixed_version") == "2.39") // but version cascades from echo
    assert(fixed1.getAs[String]("change_type") == "new")
    assert(fixed1.getAs[String]("data_source") == "echo_advisory")

    val enriched3 = prod(("CVE-2024-3", "openssl"))
    assert(enriched3.getAs[String]("status") == "fixed") // NVD found a fix
    assert(enriched3.getAs[String]("fixed_version") == "3.0.14")
    assert(enriched3.getAs[String]("data_source") == "enrichment")
    assert(enriched3.getAs[String]("internal_status")
      .startsWith("Fix version identified: 3.0.14"))

    val awaiting4 = prod(("CVE-2024-4", "openssl"))
    assert(awaiting4.getAs[String]("status") == "pending_upstream")

    assert(nvdCalls.get() == 2) // only the pending, non-overridden pair
    // cache partition written
    val cache = spark.read.parquet(s"$base/output/enrichment_cache")
    assert(cache.where("source_name = 'nvd'").count() == 2)
  }

  test("run 2 within TTL: cache short-circuits the API, rows unchanged") {
    val transport = new StubTransport
    nvdCalls.set(0)
    val config = PipelineConfig.fromDefaults("run2", base)
    val prod = Pipelines.run(spark, config, transport, NvdConfig(partitions = 2),
      "http://stub", overridesDf, now = Instant.parse("2026-02-01T00:01:00Z"))
      .collect()

    assert(nvdCalls.get() == 0) // TTL cache absorbed everything
    assert(prod.length == 4)
    assert(prod.forall(_.getAs[String]("change_type") == "unchanged"))
    // terminal/previous states preserved
    val m = prod.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(m(("CVE-2024-3", "openssl")).getAs[String]("status") == "fixed")
    assert(m(("CVE-2024-3", "openssl")).getAs[String]("previous_status") == "fixed")
  }

  test("snapshot-committed prod mode matches the overwrite mode exactly " +
      "and keeps prior runs time-travel-readable") {
    val owBase = Files.createTempDirectory("advisory-e2e-ow").toString
    val snBase = Files.createTempDirectory("advisory-e2e-sn").toString
    def runOnce(b: String, runId: String, snap: Boolean, at: String) = {
      val cfg = PipelineConfig.fromDefaults(runId, b)
        .copy(prodSnapshot = snap)
      Pipelines.run(spark, cfg, new StubTransport, NvdConfig(partitions = 2),
        "http://stub", overridesDf, now = Instant.parse(at))
    }
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq.toVector: Seq[Any]).toSet
    // run 1 (bootstrap) and run 2 (TTL-cached, all unchanged) must
    // produce IDENTICAL prod content in both commit modes
    val ow1 = rows(runOnce(owBase, "m1", snap = false, "2026-02-01T00:00:00Z"))
    val sn1 = rows(runOnce(snBase, "m1", snap = true, "2026-02-01T00:00:00Z"))
    assert(sn1 == ow1, "bootstrap run: snapshot prod must equal overwrite prod")
    assert(sn1.size == 4)
    val ow2 = rows(runOnce(owBase, "m2", snap = false, "2026-02-01T00:01:00Z"))
    val sn2 = rows(runOnce(snBase, "m2", snap = true, "2026-02-01T00:01:00Z"))
    assert(sn2 == ow2, "second run: snapshot prod must equal overwrite prod")
    // the snapshot table versioned each pipeline run: run 1 is still
    // readable as-of its commit after run 2 replaced every row's
    // change_type — the audit capability the overwrite prod cannot have
    val prodPath = s"$snBase/output/prod/state_machine/cve_state_machine"
    assert(graft.streaming.SnapshotUpsert.versions(spark, prodPath) ==
      Seq(1L, 2L))
    assert(rows(graft.streaming.SnapshotUpsert
      .readVersion(spark, prodPath, 1L)) == sn1)
  }

  test("snapshot prod mode survives an all-empty bootstrap run " +
      "(zero advisories commit no version; the read must not fail)") {
    val b = Files.createTempDirectory("advisory-e2e-empty").toString
    class EmptyTransport extends HttpTransport {
      def get(url: String, headers: Map[String, String]): (Int, String) =
        (200, "{}")
    }
    val cfg = PipelineConfig.fromDefaults("e1", b).copy(prodSnapshot = true)
    val prod = Pipelines.run(spark, cfg, new EmptyTransport,
      NvdConfig(partitions = 2), "http://stub", overridesDf,
      now = Instant.parse("2026-02-01T00:00:00Z"))
    assert(prod.count() == 0L)
    assert(prod.columns.contains("cve_id"))
  }

  test("distributed flatten matches driver-side flatten") {
    import spark.implicits._
    val dist = graft.ingest.EchoAdvisorySource
      .flattenDistributed(spark, Seq(advisoryJson).toDF("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
      .toSet
    val drv = graft.ingest.EchoAdvisorySource.flattenDriverSide(advisoryJson).toSet
    assert(dist == drv)
    assert(drv.contains(("glibc", "CVE-2024-1", Some("2.39"))))
    assert(drv.contains(("openssl", "CVE-2024-4", None)))
    assert(!drv.exists(_._2 == "notacve"))
    assert(!drv.exists(_._1 == "badpkg"))
  }
}
