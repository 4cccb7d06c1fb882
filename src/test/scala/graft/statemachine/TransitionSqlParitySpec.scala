package graft.statemachine

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Cross-checks the SQL generators in [[TransitionSql]] (executed by
  * Spark) against the pure Scala FSM over an exhaustive grid of inputs,
  * including nulls, empties, padded and cased variants, and unrecognized
  * states. Since the oracle queries embed the SAME generated SQL text,
  * this pins Spark, DuckDB, and the Scala FSM to one semantics. */
class TransitionSqlParitySpec extends SparkSpec {

  val states: Seq[String] = Seq(
    null, "", "  ", "unknown", "pending_upstream", "fixed", "not_applicable",
    "will_not_fix", "Fixed", " pending_upstream ", "WILL_NOT_FIX", "bogus",
  )

  lazy val grid: Seq[(String, String)] =
    for { f <- states; t <- states } yield (f, t)

  lazy val gridDf = {
    val rows = new java.util.ArrayList[Row]()
    grid.foreach { case (f, t) => rows.add(Row(f, t)) }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("f", StringType, nullable = true),
      StructField("t", StringType, nullable = true))))
  }

  test("apply_transition SQL == Scala UDF semantics") {
    val got = gridDf
      .withColumn("r", TransitionFunctions.applyTransition("f", "t"))
      .collect()
    got.foreach { row =>
      val (f, t) = (row.getString(0), row.getString(1))
      val expected = StateMachine.applyTransitionUdf(f, t)
      assert(row.getString(2) == expected, s"apply($f, $t)")
    }
  }

  test("STAGED apply_transition (pre-normalized attributes) == Scala UDF semantics") {
    // the merge (and the oracle) run the staged form on BOTH engines, so
    // a staging bug would be self-consistent and invisible to the oracle
    // compare — this pins the staged text to the pure Scala FSM instead
    import org.apache.spark.sql.functions.expr
    val got = gridDf
      .withColumn("__cf", expr(TransitionSql.normalizedFrom("f")))
      .withColumn("__ct", expr(TransitionSql.normalizedTo("t")))
      .withColumn("r",
        expr(TransitionSql.applyTransitionStaged("f", "t", "__cf", "__ct")))
      .collect()
    got.foreach { row =>
      val (f, t) = (row.getString(0), row.getString(1))
      assert(row.getString(4) == StateMachine.applyTransitionUdf(f, t),
        s"staged apply($f, $t)")
    }
  }

  test("is_valid_transition SQL == Scala UDF semantics") {
    val got = gridDf
      .withColumn("r", TransitionFunctions.isValidTransition("f", "t"))
      .collect()
    got.foreach { row =>
      val (f, t) = (row.getString(0), row.getString(1))
      assert(row.getBoolean(2) == StateMachine.isValidTransitionUdf(f, t), s"valid($f, $t)")
    }
  }

  test("get_transition_explanation SQL == Scala UDF semantics") {
    val got = gridDf
      .withColumn("r", TransitionFunctions.transitionExplanation("f", "t"))
      .collect()
    got.foreach { row =>
      val (f, t) = (row.getString(0), row.getString(1))
      assert(row.getString(2) == StateMachine.transitionExplanationUdf(f, t), s"explain($f, $t)")
    }
  }

  test("full_transition SQL == Scala UDF semantics") {
    val got = gridDf
      .withColumn("r", TransitionFunctions.fullTransition("f", "t"))
      .collect()
    got.foreach { row =>
      val (f, t) = (row.getString(0), row.getString(1))
      val e = StateMachine.fullTransitionUdf(f, t)
      val r = row.getStruct(2)
      assert(r.getBoolean(0) == e.success, s"full($f, $t).success")
      assert(r.getString(1) == e.oldState, s"full($f, $t).old")
      assert(r.getString(2) == e.newState, s"full($f, $t).new")
      assert(r.getString(3) == e.reason, s"full($f, $t).reason")
    }
  }

  test("registered UDFs match Column builders") {
    TransitionFunctions.registerUdfs(spark)
    gridDf.createOrReplaceTempView("fsm_grid")
    val got = spark.sql(
      """SELECT f, t, apply_transition(f, t) a, is_valid_transition(f, t) v,
        |get_transition_explanation(f, t) e FROM fsm_grid""".stripMargin).collect()
    got.foreach { row =>
      val (f, t) = (row.getString(0), row.getString(1))
      assert(row.getString(2) == StateMachine.applyTransitionUdf(f, t))
      assert(row.getBoolean(3) == StateMachine.isValidTransitionUdf(f, t))
      assert(row.getString(4) == StateMachine.transitionExplanationUdf(f, t))
    }
  }
}
