package graft.queries

import graft.statemachine.{TransitionFunctions, TransitionSql}
import org.apache.spark.sql.functions._

/** FSM operators (SURVEY §2.10) exercised over testdata-derived states.
  *
  * The from/to states are derived from `orders` columns with
  * dialect-neutral CASE text, and the transition logic itself comes from
  * [[TransitionSql]] — the Spark plan and the DuckDB oracle execute the
  * SAME generated SQL, so the oracle checks the generator, not a copy.
  * The derivations intentionally cover the reference's edge semantics:
  * NULL from-state, mixed-case ('Fixed') and empty-string proposals.
  */
object FsmQueries {

  /** Derived "current" state: F->fixed, O->pending_upstream, P->NULL. */
  private val prevSql =
    "CASE WHEN o_orderstatus = 'F' THEN 'fixed' " +
      "WHEN o_orderstatus = 'O' THEN 'pending_upstream' ELSE NULL END"

  /** Derived proposal, covering valid, invalid, cased and empty inputs. */
  private val propSql =
    "CASE WHEN o_orderpriority = '1-URGENT' THEN 'fixed' " +
      "WHEN o_orderpriority = '2-HIGH' THEN 'will_not_fix' " +
      "WHEN o_orderpriority = '3-MEDIUM' THEN 'Fixed' " +
      "WHEN o_orderpriority = '4-NOT SPECIFIED' THEN '' " +
      "ELSE 'pending_upstream' END"

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q_fsm_transitions",
      (s, d) => QueryDef.load(s, d, "orders")
        .selectExpr("o_orderkey", s"($prevSql) AS prev", s"($propSql) AS proposed")
        .withColumn("new_state", TransitionFunctions.applyTransition("prev", "proposed"))
        .withColumn("valid", TransitionFunctions.isValidTransition("prev", "proposed"))
        .withColumn("reason", TransitionFunctions.transitionExplanation("prev", "proposed")),
      Some(s"""WITH staged AS (
              |  SELECT o_orderkey, ($prevSql) AS prev, ($propSql) AS proposed
              |  FROM orders)
              |SELECT o_orderkey, prev, proposed,
              | ${TransitionSql.applyTransition("prev", "proposed")} AS new_state,
              | ${TransitionSql.isValidTransition("prev", "proposed")} AS valid,
              | ${TransitionSql.transitionExplanation("prev", "proposed")} AS reason
              |FROM staged""".stripMargin),
    ),

    QueryDef(
      "q_fsm_full_transition",
      (s, d) => {
        val fields = TransitionSql.fullTransitionFields("prev", "proposed")
        QueryDef.load(s, d, "orders")
          .selectExpr("o_orderkey", s"($prevSql) AS prev", s"($propSql) AS proposed")
          .selectExpr("o_orderkey",
            s"${fields("success")} AS success",
            s"${fields("old_state")} AS old_state",
            s"${fields("new_state")} AS new_state",
            s"${fields("reason")} AS reason")
      },
      Some {
        val fields = TransitionSql.fullTransitionFields("prev", "proposed")
        s"""WITH staged AS (
           |  SELECT o_orderkey, ($prevSql) AS prev, ($propSql) AS proposed
           |  FROM orders)
           |SELECT o_orderkey,
           | ${fields("success")} AS success,
           | ${fields("old_state")} AS old_state,
           | ${fields("new_state")} AS new_state,
           | ${fields("reason")} AS reason
           |FROM staged""".stripMargin
      },
    ),
  )
}
