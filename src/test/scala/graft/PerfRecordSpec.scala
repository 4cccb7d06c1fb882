package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry <-> committed-bench lockstep.
  *
  * `graft.Bench` itself always iterates `SparkEntry.queries`, so a live
  * run can't miss a query — but the COMMITTED perf records can trail
  * the registry (round 4 shipped 112-query records against a 113-query
  * registry). This spec pins the newest committed sf0.1 record to the
  * exact registered query set, so adding a query without refreshing the
  * bench records fails the build instead of silently shipping a stale
  * perf story.
  */
class PerfRecordSpec extends AnyFunSuite {

  private def latestRecord(prefix: String): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get("perf")
    val rx = (java.util.regex.Pattern.quote(prefix) + "_r(\\d+)\\.json").r
    val all = java.nio.file.Files.list(dir).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .flatMap { p =>
        p.getFileName.toString match {
          case rx(n) => Some((n.toInt, p))
          case _ => None
        }
      }
    assert(all.nonEmpty, s"no committed perf/${prefix}_r*.json records")
    all.maxBy(_._1)._2
  }

  private def assertLockstep(prefix: String): Unit = {
    val txt = new String(
      java.nio.file.Files.readAllBytes(latestRecord(prefix)),
      java.nio.charset.StandardCharsets.UTF_8)
    // bench record keys are `"<name>":<seconds>` inside the "queries"
    // object; failed-query names sit in a bare array (no colon) and are
    // intentionally NOT counted as covered
    val benched = "\"(q_[a-z0-9_]+)\":".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    val registered = SparkEntry.queries.keySet
    val missing = registered -- benched
    val stale = benched -- registered
    assert(missing.isEmpty && stale.isEmpty,
      s"committed $prefix bench record out of lockstep with the registry — " +
        s"missing: ${missing.toSeq.sorted.mkString(",")}; " +
        s"stale: ${stale.toSeq.sorted.mkString(",")}")
    // eager-build queries execute their iterative builds at plan
    // construction, so per-pass seconds understate them; the record
    // must carry their build cost (r5 verdict task #7). Bench emits
    // build_seconds for any build >= 0.5 s — these four are iterative
    // by construction and far above that at every recorded sf.
    val eager = Seq("q_bpe_learn", "q_text_tokens_bpe_learned",
      "q_dedup_clusters", "q_dedup_canonical", "q_sim_topk_pq_trained")
    val buildSection = txt.indexOf("\"build_seconds\"")
    assert(buildSection >= 0,
      s"$prefix record has no build_seconds section — rerun graft.Bench")
    val after = txt.substring(buildSection)
    val missingBuilds = eager.filterNot(q => after.contains("\"" + q + "\":"))
    assert(missingBuilds.isEmpty,
      s"$prefix record lacks build_seconds for eager queries: " +
        missingBuilds.mkString(","))
  }

  test("latest committed sf0.1 bench record covers exactly the registry") {
    assertLockstep("bench_sf01")
  }

  test("latest committed sf1 bench record covers exactly the registry") {
    assertLockstep("bench_sf1")
  }
}
