package graft.statemachine

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks._

/** FSM truth table ported from the reference's behavioral suite
  * (reference: test/test_state_transitions.py). */
class StateMachineSpec extends AnyFunSuite {
  import StateMachine._

  test("enum values") {
    assert(AdvisoryState.all.map(_.value) ==
      Seq("unknown", "pending_upstream", "fixed", "not_applicable", "will_not_fix"))
  }

  test("transition whitelist") {
    import AdvisoryState._
    assert(validTransitions(Unknown) == Set(PendingUpstream, Fixed))
    assert(validTransitions(PendingUpstream) == Set(Fixed, NotApplicable, WillNotFix))
    assert(validTransitions(Fixed).isEmpty)
    assert(validTransitions(NotApplicable).isEmpty)
    assert(validTransitions(WillNotFix).isEmpty)
    assert(terminalStates == Set(Fixed, NotApplicable, WillNotFix))
  }

  val validCases = Table(
    ("from", "to"),
    ("unknown", "pending_upstream"),
    ("unknown", "fixed"),
    ("pending_upstream", "fixed"),
    ("pending_upstream", "not_applicable"),
    ("pending_upstream", "will_not_fix"),
    // same-state is always valid
    ("unknown", "unknown"),
    ("pending_upstream", "pending_upstream"),
    ("fixed", "fixed"),
    ("not_applicable", "not_applicable"),
    ("will_not_fix", "will_not_fix"),
  )

  val invalidCases = Table(
    ("from", "to"),
    ("fixed", "pending_upstream"),
    ("fixed", "unknown"),
    ("not_applicable", "pending_upstream"),
    ("will_not_fix", "fixed"),
    ("unknown", "not_applicable"),
    ("unknown", "will_not_fix"),
    ("pending_upstream", "unknown"),
    // unrecognized states are invalid even when equal-ish in case
    ("bogus", "fixed"),
    ("unknown", "bogus"),
    ("Fixed", "fixed"),
    ("FIXED", "FIXED"),
  )

  test("is_valid_transition truth table") {
    forAll(validCases) { (f, t) => assert(isValidTransition(f, t)) }
    forAll(invalidCases) { (f, t) => assert(!isValidTransition(f, t)) }
  }

  test("apply_transition: valid transitions move state") {
    val r = applyTransition("pending_upstream", "fixed")
    assert(r.success && r.newState == "fixed" &&
      r.reason == "Valid transition: pending_upstream -> fixed")
  }

  test("apply_transition: invalid keeps old state") {
    val r = applyTransition("unknown", "will_not_fix")
    assert(!r.success && r.newState == "unknown" &&
      r.reason == "Invalid transition: unknown -> will_not_fix")
  }

  test("apply_transition: terminal states are absorbing") {
    for (term <- Seq("fixed", "not_applicable", "will_not_fix")) {
      val r = applyTransition(term, "pending_upstream")
      assert(!r.success && r.newState == term &&
        r.reason == s"Cannot transition from terminal state '$term'")
    }
  }

  test("apply_transition: null/empty from -> unknown") {
    assert(applyTransition(null, "pending_upstream").newState == "pending_upstream")
    assert(applyTransition("", "fixed").newState == "fixed")
    assert(applyTransition(null, "not_applicable").newState == "unknown")
  }

  test("apply_transition: normalization (case + whitespace)") {
    val r = applyTransition("  PENDING_UPSTREAM ", "Fixed")
    assert(r.success && r.oldState == "pending_upstream" && r.newState == "fixed")
  }

  test("apply_transition: same-state no-op succeeds, even unrecognized") {
    val r = applyTransition("weird_state", "weird_state")
    assert(r.success && r.newState == "weird_state" && r.reason == "No change required")
    val r2 = applyTransition("fixed", "FIXED ")
    assert(r2.success && r2.reason == "No change required")
  }

  test("apply_transition: allow_invalid override") {
    val r = applyTransition("fixed", "unknown", allowInvalid = true)
    // terminal check fires before allow_invalid — terminal still blocks
    assert(!r.success)
    val r2 = applyTransition("unknown", "will_not_fix", allowInvalid = true)
    assert(r2.success && r2.newState == "will_not_fix" &&
      r2.reason.startsWith("WARNING: Invalid transition allowed"))
  }

  test("explanations: mapped pairs and fallback") {
    assert(transitionExplanation("unknown", "pending_upstream") ==
      "CVE identified. Awaiting fix from upstream maintainer.")
    assert(transitionExplanation("PENDING_UPSTREAM", "Fixed") ==
      "Fix version has been released by upstream maintainer.")
    assert(transitionExplanation("fixed", "unknown") ==
      "State changed from fixed to unknown")
    // fallback keeps original casing
    assert(transitionExplanation("Fixed", "Unknown") ==
      "State changed from Fixed to Unknown")
  }

  test("udf wrappers: null handling") {
    assert(!isValidTransitionUdf(null, null))
    assert(isValidTransitionUdf(null, "pending_upstream"))
    assert(applyTransitionUdf(null, null) == "unknown")
    assert(applyTransitionUdf("fixed", null) == "fixed")
    assert(transitionExplanationUdf("fixed", null) == "No state change proposed")
    assert(fullTransitionUdf(null, null) ==
      TransitionResult(success = true, "unknown", "unknown", "No change required"))
  }
}
