package graft.statemachine

/** Five-state advisory finite-state machine.
  *
  * Pure Scala (no Spark dependency) re-expression of the reference FSM
  * (reference: src/advisory_pipeline/state_machine/state_transitions.py:6-144).
  * Semantics are preserved exactly, including the subtle parts:
  *
  *   - `isValidTransition` does NOT normalize case/whitespace — an
  *     unrecognized state string (even `"Fixed"`) is invalid
  *     (state_transitions.py:62-66), yet `applyTransition` lowercases,
  *     trims, maps null/"" to `unknown`, and treats same-state (after
  *     normalization) as a successful no-op even for unrecognized states
  *     (state_transitions.py:93-107).
  *   - Terminal states (`fixed`, `not_applicable`, `will_not_fix`) are
  *     absorbing: any attempted change out of them fails and keeps the
  *     old state (state_transitions.py:109-121).
  */
sealed abstract class AdvisoryState(val value: String)

object AdvisoryState {
  case object Unknown extends AdvisoryState("unknown")
  case object PendingUpstream extends AdvisoryState("pending_upstream")
  case object Fixed extends AdvisoryState("fixed")
  case object NotApplicable extends AdvisoryState("not_applicable")
  case object WillNotFix extends AdvisoryState("will_not_fix")

  val all: Seq[AdvisoryState] =
    Seq(Unknown, PendingUpstream, Fixed, NotApplicable, WillNotFix)

  val validValues: Set[String] = all.map(_.value).toSet

  def fromValue(s: String): Option[AdvisoryState] = all.find(_.value == s)

  /** {from -> allowed to-states}; terminal states map to empty. */
  val validTransitions: Map[AdvisoryState, Set[AdvisoryState]] = Map(
    Unknown -> Set(PendingUpstream, Fixed),
    PendingUpstream -> Set(Fixed, NotApplicable, WillNotFix),
    Fixed -> Set.empty,
    NotApplicable -> Set.empty,
    WillNotFix -> Set.empty,
  )

  val terminalStates: Set[AdvisoryState] = Set(Fixed, NotApplicable, WillNotFix)
}

/** Result of a state-transition attempt (mirrors the reference's
  * 4-field `TransitionResult`, state_transitions.py:41-48). */
final case class TransitionResult(
    success: Boolean,
    oldState: String,
    newState: String,
    reason: String,
)

object StateMachine {
  import AdvisoryState._

  /** Exact-string validity check — no normalization
    * (state_transitions.py:51-73). */
  def isValidTransition(fromState: String, toState: String): Boolean =
    (fromValue(fromState), fromValue(toState)) match {
      case (Some(f), Some(t)) =>
        f == t || validTransitions.getOrElse(f, Set.empty).contains(t)
      case _ => false
    }

  /** Normalizing transition application — keeps the old state when the
    * transition is invalid (state_transitions.py:76-144). */
  def applyTransition(
      currentState: String,
      proposedState: String,
      allowInvalid: Boolean = false,
  ): TransitionResult = {
    // None/"" -> unknown happens BEFORE strip: "  " stays "" after
    // normalization rather than becoming unknown.
    val defaulted =
      if (currentState == null || currentState == "") Unknown.value
      else currentState
    val cur = defaulted.toLowerCase.trim
    val prop = proposedState.toLowerCase.trim

    if (cur == prop)
      TransitionResult(success = true, cur, prop, "No change required")
    else if (fromValue(cur).exists(terminalStates.contains))
      TransitionResult(
        success = false, cur, cur,
        s"Cannot transition from terminal state '$cur'")
    else if (isValidTransition(cur, prop))
      TransitionResult(success = true, cur, prop, s"Valid transition: $cur -> $prop")
    else if (allowInvalid)
      TransitionResult(
        success = true, cur, prop,
        s"WARNING: Invalid transition allowed: $cur -> $prop")
    else
      TransitionResult(success = false, cur, cur, s"Invalid transition: $cur -> $prop")
  }

  /** Customer-facing explanation; lowercases (but does not trim) both
    * keys for the 5-entry lookup, falls back to a generic message built
    * from the ORIGINAL inputs (state_transitions.py:147-179). */
  def transitionExplanation(fromState: String, toState: String): String = {
    val key = (fromState.toLowerCase, toState.toLowerCase)
    explanations.getOrElse(key, s"State changed from $fromState to $toState")
  }

  val explanations: Map[(String, String), String] = Map(
    ("unknown", "pending_upstream") ->
      "CVE identified. Awaiting fix from upstream maintainer.",
    ("unknown", "fixed") ->
      "CVE identified with fix already available.",
    ("pending_upstream", "fixed") ->
      "Fix version has been released by upstream maintainer.",
    ("pending_upstream", "not_applicable") ->
      "After analysis, this CVE does not apply to your context.",
    ("pending_upstream", "will_not_fix") ->
      "Upstream maintainer has decided not to fix this vulnerability.",
  )

  // ---- Null-tolerant wrappers with the exact semantics of the four
  // ---- registered SQL UDFs (reference: state_machine/udf.py:26-80).

  def isValidTransitionUdf(from: String, to: String): Boolean = {
    val f = if (from == null) Unknown.value else from
    if (to == null) false else isValidTransition(f, to)
  }

  def applyTransitionUdf(from: String, to: String): String = {
    val f = if (from == null) Unknown.value else from
    if (to == null) f else applyTransition(f, to).newState
  }

  def transitionExplanationUdf(from: String, to: String): String = {
    val f = if (from == null) Unknown.value else from
    if (to == null) "No state change proposed" else transitionExplanation(f, to)
  }

  def fullTransitionUdf(from: String, to: String): TransitionResult = {
    val f = if (from == null) Unknown.value else from
    val t = if (to == null) f else to
    applyTransition(f, t)
  }
}
