package graft.plans

import graft.SparkSpec
import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The native sorted-merge as-of node vs the composed union-window
  * form, plus the edge semantics only the node defines. */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def trades: DataFrame = Seq(
    // (id, sym, ts)
    (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L),
    (4L, "B", 15L), (5L, "B", 16L),
    (6L, "C", 5L), // before any quote
    (7L, "D", 50L), // no quotes for D at all
  ).toDF("trade_id", "sym", "ts")

  private def quotes: DataFrame = Seq(
    ("A", 10L, 1.0), ("A", 25L, 2.0), // exact-ts match + later update
    ("B", 1L, 5.0), ("B", 16L, 6.0),
    ("C", 9L, 9.0), // after the only C trade
  ).toDF("sym", "qts", "px")

  private def runMerge(l: DataFrame, r: DataFrame): DataFrame =
    AsOfJoin.asOfJoinMerge(l, r, Seq("sym"), "ts", "qts", Seq("px"))

  test("merge node matches hand-computed asof semantics (>= inclusive)") {
    val got = runMerge(trades, quotes)
      .select("trade_id", "asof_qts", "asof_px")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Some(10L), Some(1.0)), // exact ts ties match
      (2L, Some(10L), Some(1.0)),
      (3L, Some(25L), Some(2.0)),
      (4L, Some(1L), Some(5.0)),
      (5L, Some(16L), Some(6.0)),
      (6L, None, None), // quote is later: unmatched
      (7L, None, None), // no right rows for key
    ))
  }

  test("merge node agrees with the union-window composition on events") {
    val ev = graft.queries.QueryDef.loadEvents(spark, sf)
      .withColumn("ts", col("ts").cast("long"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
      // unique per (key, ts): keep max click_id per second
      .groupBy("user_id", "cts").agg(max("click_id").as("click_id"))

    val viaNode = AsOfJoin
      .asOfJoinMerge(purchases, clicks, Seq("user_id"), "ts", "cts", Seq("click_id"))
      .select("event_id", "asof_cts", "asof_click_id")
    val viaWindow = AsOfJoin
      .asOfJoin(purchases, clicks, Seq("user_id"), "ts", "cts", Seq("click_id"))
      .select("event_id", "asof_cts", "asof_click_id")
    assert(viaNode.count() == purchases.count())
    assert(viaNode.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaNode).isEmpty)
  }

  test("null keys and null timestamps never match but left rows survive") {
    val l = Seq((1L, Option("A"), Option(10L)), (2L, None, Option(10L)),
      (3L, Option("A"), None)).toDF("id", "sym", "ts")
    val r = Seq((Option("A"), Option(5L), 1.0), (None, Option(1L), 2.0),
      (Option("A"), None, 3.0)).toDF("sym", "qts", "px")
    val got = runMerge(l, r).select("id", "asof_px")
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, Some(1.0)), (2L, None), (3L, None)))
  }

  test("empty right side leaves every left row unmatched") {
    val got = runMerge(trades, quotes.filter(col("px") < 0))
    assert(got.count() == 7 && got.filter(col("asof_px").isNotNull).count() == 0)
  }

  test("plans AsOfJoinExec; co-partitioned input needs no extra exchange") {
    // AQE wraps exchanges in query stages, which plan.collect does not
    // descend into — inspect the static plan instead
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = runMerge(trades.repartition(4, col("sym")),
        quotes.repartition(4, col("sym")))
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case e: AsOfJoinExec => e }.nonEmpty,
        plan.toString)
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      // the two repartition() calls are the only shuffles — the node
      // itself adds none on already-co-partitioned input
      assert(exchanges.size == 2, plan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("duplicate left timestamps all get the same carried right row") {
    val l = Seq((1L, "A", 10L), (2L, "A", 10L), (3L, "A", 10L))
      .toDF("trade_id", "sym", "ts")
    val got = runMerge(l, quotes).select("trade_id", "asof_px")
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, Some(1.0)), (2L, Some(1.0)), (3L, Some(1.0))))
  }
}
