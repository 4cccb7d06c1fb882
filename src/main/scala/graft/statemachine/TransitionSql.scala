package graft.statemachine

/** Dialect-neutral SQL text for the advisory FSM.
  *
  * Each generator takes SQL *expression strings* for the from/to states
  * and returns a `CASE` expression that is valid in both Spark SQL and
  * ANSI engines (DuckDB). The same text is used to build the Spark plan
  * (via `expr(...)` — plain Catalyst CASE, fully codegen'd, no UDF
  * serialization) and the DuckDB oracle query, so the two sides cannot
  * drift. Semantics mirror the reference UDFs exactly
  * (reference: src/advisory_pipeline/state_machine/udf.py:26-80,
  * state_transitions.py:51-179); see [[StateMachine]] for the traps.
  *
  * At 100 TB scale this matters: a Python UDF forces a per-row
  * JVM<->interpreter round trip and breaks whole-stage codegen; a plain
  * CASE expression vectorizes and costs nothing beyond the comparisons.
  */
object TransitionSql {
  private val terminalIn = "('fixed','not_applicable','will_not_fix')"

  /** Normalized "current" state: null/'' -> unknown, then lower+trim.
    * Exposed so callers can STAGE it once in a projection and hand the
    * resulting attribute to [[applyTransitionStaged]] — inlined, the
    * normalization repeats ~8x inside one CASE and three such columns
    * stack in the merge, a needlessly large tree for Catalyst to
    * re-optimize/codegen on every plan build. */
  def normalizedFrom(f: String): String =
    s"lower(trim(CASE WHEN ($f) IS NULL OR ($f) = '' THEN 'unknown' ELSE ($f) END))"

  /** Normalized "proposed" state (plain lower+trim). */
  def normalizedTo(e: String): String = s"lower(trim($e))"

  private def norm(f: String): String = normalizedFrom(f)
  private def lowTrim(e: String): String = normalizedTo(e)

  /** [[applyTransition]] over pre-staged normalized expressions: `cf`
    * and `ct` are usually attribute names of columns holding
    * [[normalizedFrom]]/[[normalizedTo]] of `f`/`t`. The raw `f`/`t`
    * are still needed for the null checks and raw passthrough. */
  def applyTransitionStaged(f: String, t: String, cf: String, ct: String): String =
    s"""CASE WHEN ($t) IS NULL THEN (CASE WHEN ($f) IS NULL THEN 'unknown' ELSE ($f) END)
       |WHEN $ct = $cf THEN $ct
       |WHEN $cf IN $terminalIn THEN $cf
       |WHEN $cf = 'unknown' AND $ct IN ('pending_upstream','fixed') THEN $ct
       |WHEN $cf = 'pending_upstream' AND $ct IN $terminalIn THEN $ct
       |ELSE $cf END""".stripMargin.replace('\n', ' ')

  /** `apply_transition(from, to)` SQL: new state; keeps old on invalid;
    * null to -> from (unnormalized, null from -> 'unknown'). Self-
    * contained form (normalization inlined); pipelines should stage via
    * [[applyTransitionStaged]]. */
  def applyTransition(f: String, t: String): String =
    applyTransitionStaged(f, t, norm(f), lowTrim(t))

  /** `is_valid_transition(from, to)` SQL: exact-string membership (NO
    * case normalization — 'Fixed' is an unrecognized state -> false);
    * null from -> 'unknown', null to -> false. */
  def isValidTransition(f: String, t: String): String = {
    val fv = s"COALESCE($f, 'unknown')"
    val allStates =
      "('unknown','pending_upstream','fixed','not_applicable','will_not_fix')"
    s"""CASE WHEN ($t) IS NULL THEN false
       |WHEN $fv NOT IN $allStates OR ($t) NOT IN $allStates THEN false
       |WHEN $fv = ($t) THEN true
       |WHEN $fv = 'unknown' AND ($t) IN ('pending_upstream','fixed') THEN true
       |WHEN $fv = 'pending_upstream' AND ($t) IN $terminalIn THEN true
       |ELSE false END""".stripMargin.replace('\n', ' ')
  }

  /** `get_transition_explanation(from, to)` SQL: 5-entry lookup on
    * lowercased (untrimmed) keys, generic fallback built from the
    * original inputs; null to -> fixed message. */
  def transitionExplanation(f: String, t: String): String = {
    val fv = s"COALESCE($f, 'unknown')"
    val lf = s"lower($fv)"
    val lt = s"lower($t)"
    val entries = StateMachine.explanations.map { case ((from, to), text) =>
      s"WHEN $lf = '$from' AND $lt = '$to' THEN '${text.replace("'", "''")}'"
    }.mkString(" ")
    s"""CASE WHEN ($t) IS NULL THEN 'No state change proposed'
       |$entries
       |ELSE concat('State changed from ', $fv, ' to ', ($t)) END"""
      .stripMargin.replace('\n', ' ')
  }

  /** `full_transition(from, to)` flattened fields (success, old_state,
    * new_state, reason). null to -> to := from (then same-state no-op). */
  def fullTransitionFields(f: String, t: String): Map[String, String] = {
    val tEff = s"CASE WHEN ($t) IS NULL THEN COALESCE($f, 'unknown') ELSE ($t) END"
    val cf = norm(f)
    val ct = lowTrim(tEff)
    val validCase =
      s"""($cf = 'unknown' AND $ct IN ('pending_upstream','fixed'))
         | OR ($cf = 'pending_upstream' AND $ct IN $terminalIn)"""
        .stripMargin.replace('\n', ' ')
    val success =
      s"CASE WHEN $ct = $cf THEN true WHEN $cf IN $terminalIn THEN false WHEN $validCase THEN true ELSE false END"
    val newState =
      s"CASE WHEN $ct = $cf THEN $ct WHEN $cf IN $terminalIn THEN $cf WHEN $validCase THEN $ct ELSE $cf END"
    val reason =
      s"""CASE WHEN $ct = $cf THEN 'No change required'
         |WHEN $cf IN $terminalIn THEN concat('Cannot transition from terminal state ''', $cf, '''')
         |WHEN $validCase THEN concat('Valid transition: ', $cf, ' -> ', $ct)
         |ELSE concat('Invalid transition: ', $cf, ' -> ', $ct) END"""
        .stripMargin.replace('\n', ' ')
    Map(
      "success" -> success,
      "old_state" -> cf,
      "new_state" -> newState,
      "reason" -> reason,
    )
  }
}
