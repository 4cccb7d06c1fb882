package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests for the round-6 session operators: shard balance
  * must hold for ANY size distribution, budget selection must equal
  * the serial greedy for any (score, cost) layout and any bucket
  * count, RRF must be input-order invariant, and exact-n samples must
  * nest. Case counts small — every case runs real Spark jobs. */
object SessionOpsPropsSpec extends Properties("SessionOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  property("shardAssign totals within one max doc, any sizes, any nShards") =
    forAll(Gen.listOfN(60, Gen.chooseNum(1L, 500L)),
      Gen.chooseNum(1, 9)) { (sizes, n) =>
      val df = sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "sz")
      val out = Corpus.shardAssign(df, "id", "sz", nShards = n)
        .collect().map(r => (r.getLong(1), r.getInt(2)))
      val totals = (0 until n).map(s =>
        out.filter(_._2 == s).map(_._1).sum)
      val bound = sizes.max
      Prop(totals.max - totals.min <= bound) :|
        s"spread ${totals.max - totals.min} > max doc $bound"
    }

  property("selectUnderBudget == serial greedy, any buckets") =
    forAll(Gen.listOfN(50, Gen.zip(Gen.chooseNum(0, 99), Gen.chooseNum(1L, 60L))),
      Gen.chooseNum(50L, 800L), Gen.oneOf(1, 5, 32)) { (rows, budget, buckets) =>
      val df = rows.zipWithIndex
        .map { case ((s, c), i) => (i.toLong, s.toDouble, c) }
        .toDF("id", "score", "cost")
      val got = Corpus.selectUnderBudget(df, "id", "score", "cost",
          budget, buckets)
        .collect().map(_.getLong(0)).toSet
      val exp = rows.zipWithIndex
        .map { case ((s, c), i) => (i.toLong, s.toDouble, c) }
        .sortBy { case (id, s, _) => (-s, id) }
        .scanLeft((-1L, 0L)) { case ((_, run), (id, _, c)) => (id, run + c) }
        .drop(1).takeWhile(_._2 <= budget).map(_._1).toSet
      Prop(got == exp) :| s"got=$got exp=$exp"
    }

  property("rrfFuse is invariant to input order and within-input row order") =
    forAll(Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 9L), Gen.chooseNum(1, 8)))) {
      rows0 =>
      // one rank per (query, doc) per system half
      val rows = rows0.distinctBy(r => (r._1, r._2))
      val (h1, h2) = rows.splitAt(rows.size / 2)
      def df(xs: Seq[(Long, Long, Int)]) =
        xs.toDF("query_id", "doc_id", "rank")
      def run(a: Seq[(Long, Long, Int)], b: Seq[(Long, Long, Int)]) =
        Similarity.rrfFuse(Seq(df(a), df(b)), topK = 5)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getDouble(2), r.getInt(4))).toSet
      Prop(run(h1, h2) == run(h2.reverse, h1.reverse)) :| "order sensitivity"
    }

  property("sampleExactN nests and is exact for any n ladder") =
    forAll(Gen.chooseNum(5, 60), Gen.chooseNum(61, 120)) { (small, big) =>
      val df = (1L to 150L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      val s = Corpus.sampleExactN(df, "doc_id", small)
        .collect().map(_.getLong(0)).toSet
      val b = Corpus.sampleExactN(df, "doc_id", big)
        .collect().map(_.getLong(0)).toSet
      Prop(s.size == small && b.size == big && s.subsetOf(b)) :|
        s"small=${s.size} big=${b.size} nested=${s.subsetOf(b)}"
    }
}
