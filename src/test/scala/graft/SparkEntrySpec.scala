package graft

/** Driver-contract smoke: what the round harness checks first. */
class SparkEntrySpec extends SparkSpec {

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are unique") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o.diff(q)}")
    assert(SparkEntry.registry.map(_.name).distinct.size ==
      SparkEntry.registry.size)
  }

  test("every query runs and yields a non-empty, parquet-writable result") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows at sf0.001")
    }
  }
}
