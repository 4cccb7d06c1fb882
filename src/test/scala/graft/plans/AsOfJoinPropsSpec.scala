package graft.plans

import graft.operators.AsOfJoin
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: the native sorted-merge node must agree with a
  * driver-side reference as-of computation for ANY key/timestamp
  * layout — duplicate left timestamps, keys missing on either side,
  * exact-ts ties (inclusive), and multi-partition hash placement.
  * Right rows are deduped per (key, ts) as the operator contract
  * requires. Case counts small — each case runs real Spark jobs. */
object AsOfJoinPropsSpec extends Properties("AsOfJoinExec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private val keyGen = Gen.oneOf("a", "b", "c", "d")
  private val tsGen = Gen.chooseNum(0L, 40L)

  property("node == reference model for any layout") =
    forAll(Gen.listOfN(30, Gen.zip(keyGen, tsGen)),
      Gen.listOfN(20, Gen.zip(keyGen, tsGen))) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "ts")
      // contract: right unique per (key, ts); value = max payload wins
      val rightRows = rs.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong * 10) }
        .groupBy(r => (r._1, r._2)).values
        .map(_.maxBy(_._3)).toSeq
      val right = rightRows.toDF("k", "rts", "payload")

      val got = AsOfJoin
        .asOfJoinMerge(left, right, Seq("k"), "ts", "rts", Seq("payload"))
        .select($"lid", $"asof_payload")
        .as[(Long, Option[Long])].collect().toMap

      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val best = rightRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption
        i.toLong -> best.map(_._3)
      }.toMap

      got == expected
    }
}
