package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Property tests for the mergeable sketch family: for ANY small
  * multiset and ANY shard assignment, the sharded build-then-union
  * path must equal ground truth computed in plain Scala — the monoid
  * law under arbitrary data placement, which is exactly what a cluster
  * exercises (rows land on shards by partitioning accident, results
  * must not care). Case counts kept small — every case runs real
  * Spark jobs. */
object SketchPropsSpec extends Properties("Sketches") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private val valGen = Gen.chooseNum(-500, 500)
  private val shardGen = Gen.chooseNum(0, 7)

  property("KLL sharded quantiles == exact nearest-rank, any shards") =
    forAll(Gen.nonEmptyListOf(Gen.zip(valGen, shardGen))) { rows =>
      val df = rows.map { case (v, s) => (v.toLong, s) }
        .toDF("v", "shard").withColumn("g", lit("all"))
      val ranks = Seq(0.25 -> "q25", 0.5 -> "q50", 0.9 -> "q90")
      val got = Sketches.shardedQuantiles(df, Seq("g"), "v", "shard",
        ranks, k = 4096).head()
      val sorted = rows.map(_._1.toDouble).sorted
      val want = ranks.map { case (r, _) =>
        sorted(math.ceil(r * sorted.length).toInt - 1)
      }
      val ok = (1 to 3).forall(i => got.getDouble(i) == want(i - 1))
      if (!ok) println(s"got=$got want=$want n=${rows.length}")
      ok
    }

  property("frequent-items sharded top-k == exact counts, any shards") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 30), shardGen))) {
      rows =>
      val df = rows.map { case (v, s) => (s"item$v", s) }
        .toDF("item", "shard").withColumn("g", lit("all"))
      val got = Sketches.shardedTopK(df, Seq("g"), "item", "shard",
        topK = 3, maxMapSize = 128)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toList
      val counts = rows.groupBy(r => s"item${r._1}").view
        .mapValues(_.size.toLong).toMap
      val want = counts.toList.sortBy { case (i, c) => (-c, i) }.take(3)
      got == want
    }

  property("theta overlap == exact set algebra, any shards") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 40)),
      Gen.nonEmptyListOf(Gen.chooseNum(20, 60)), shardGen) { (as, bs, sh) =>
      val df = (as.map(v => ("a", s"v$v")) ++ bs.map(v => ("b", s"v$v")))
        .zipWithIndex.map { case ((seg, s), i) => (seg, s, i % (sh + 1)) }
        .toDF("seg", "item", "shard")
      val row = Sketches.segmentOverlap(df, "seg", "item", "shard").head()
      val (sa, sb) = (as.map(v => s"v$v").toSet, bs.map(v => s"v$v").toSet)
      row.getLong(2) == (sa & sb).size.toLong &&
        row.getLong(3) == (sa -- sb).size.toLong &&
        row.getLong(4) == (sb -- sa).size.toLong
    }
}
