package graft.statemachine

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the FSM invariants the truth table can't
  * enumerate: arbitrary (including garbage) state strings. */
object StateMachinePropsSpec extends Properties("StateMachine") {

  val knownStates: Gen[String] = Gen.oneOf(
    "unknown", "pending_upstream", "fixed", "not_applicable", "will_not_fix")

  val messyStates: Gen[String] = Gen.oneOf(
    knownStates,
    knownStates.map(_.toUpperCase),
    knownStates.map(s => s"  $s "),
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""),
  )

  property("result state is always normalized and stable under re-apply") =
    forAll(messyStates, messyStates) { (f, t) =>
      val r = StateMachine.applyTransition(f, t)
      val again = StateMachine.applyTransition(r.newState, r.newState)
      again.success && again.reason == "No change required" &&
        r.newState == r.newState.toLowerCase.trim
    }

  property("terminal states are absorbing") =
    forAll(Gen.oneOf("fixed", "not_applicable", "will_not_fix"), messyStates) {
      (term, t) =>
        val r = StateMachine.applyTransition(term, t)
        val norm = t.toLowerCase.trim
        if (norm == term) r.success && r.newState == term
        else !r.success && r.newState == term
    }

  property("failure always keeps the (normalized) old state") =
    forAll(messyStates, messyStates) { (f, t) =>
      val r = StateMachine.applyTransition(f, t)
      r.success || r.newState == r.oldState
    }

  property("case/whitespace normalization is semantics-preserving") =
    forAll(knownStates, knownStates) { (f, t) =>
      val messyF = s"  ${f.toUpperCase} "
      val messyT = s"${t.toUpperCase}  "
      val clean = StateMachine.applyTransition(f, t)
      val messy = StateMachine.applyTransition(messyF, messyT)
      clean.copy(reason = "") == messy.copy(reason = "") &&
        clean.reason == messy.reason
    }

  property("isValidTransition (exact-string) implies applyTransition succeeds") =
    forAll(knownStates, knownStates) { (f, t) =>
      !StateMachine.isValidTransition(f, t) ||
        StateMachine.applyTransition(f, t).success
    }

  property("udf wrappers never throw on null/garbage") =
    forAll(Gen.oneOf(messyStates, Gen.const(null: String)),
      Gen.oneOf(messyStates, Gen.const(null: String))) { (f, t) =>
      StateMachine.applyTransitionUdf(f, t) != null.asInstanceOf[Any] || true
    }
}
