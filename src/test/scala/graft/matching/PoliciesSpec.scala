package graft.matching

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.model.{Payload, RawMatch}

/**
 * Policy pins ported from the reference's own unit tests
 * (ext/phrasekit/src/policy.rs:137-190) and rspec behavior specs
 * (spec/phrasekit_spec.rb), plus ScalaCheck invariants (SURVEY.md §5.2).
 */
class PoliciesSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val unit = (_: Int) => Payload(0, 1.0f, 100, 2)

  test("leftmost_longest: same-start group picks longest, greedy after (policy.rs:150-162)") {
    val ms = Vector(RawMatch(0, 2, 0), RawMatch(0, 3, 1), RawMatch(5, 7, 2))
    val r = Policies.resolve(ms, Policy.LeftmostLongest, unit)
    assert(r.map(m => (m.start, m.end)) == Vector((0, 3), (5, 7)))
  }

  test("leftmost_first: first-encountered wins; shorter-earlier beats longer-later (policy.rs:164-176)") {
    val ms = Vector(RawMatch(0, 2, 0), RawMatch(1, 3, 1), RawMatch(3, 5, 2))
    val r = Policies.resolve(ms, Policy.LeftmostFirst, unit)
    assert(r.map(m => (m.start, m.end)) == Vector((0, 2), (3, 5)))
  }

  test("leftmost_first: equal start → shortest wins (emission order, matcher scan)") {
    // scan order emits (0,2) before (0,3); stable start-sort keeps that order
    val ms = Vector(RawMatch(0, 2, 0), RawMatch(0, 3, 1))
    val r = Policies.resolve(ms, Policy.LeftmostFirst, unit)
    assert(r.map(m => (m.start, m.end)) == Vector((0, 2)))
  }

  test("salience_max: highest salience*ln(count+1) in overlap run wins (policy.rs:178-189)") {
    val pays = Array(Payload(0, 1.0f, 100, 2), Payload(1, 2.0f, 200, 3), Payload(2, 1.0f, 100, 2))
    val ms = Vector(RawMatch(0, 2, 0), RawMatch(0, 3, 1), RawMatch(5, 7, 2))
    val r = Policies.resolve(ms, Policy.SalienceMax, pays)
    assert(r.map(m => (m.start, m.end)) == Vector((0, 3), (5, 7)))
  }

  test("salience_max: last-max-wins on exact score ties (Rust max_by semantics)") {
    val pays = Array(Payload(10, 1.0f, 100, 2), Payload(20, 1.0f, 100, 3))
    val ms = Vector(RawMatch(0, 2, 0), RawMatch(1, 4, 1))
    val r = Policies.resolve(ms, Policy.SalienceMax, pays)
    assert(r.map(_.patternId) == Vector(1))
  }

  test("all: no resolution, emission order preserved (phrasekit_tag.rs fall-through)") {
    val ms = Vector(RawMatch(0, 2, 0), RawMatch(0, 3, 1), RawMatch(1, 3, 2))
    assert(Policies.resolve(ms, Policy.All, unit) == ms)
  }

  test("truncation happens AFTER resolution (matcher.rs:100-104)") {
    val ms = Vector(RawMatch(0, 2, 0), RawMatch(3, 5, 1), RawMatch(6, 8, 2))
    val r = Policies.truncate(Policies.resolve(ms, Policy.LeftmostFirst, unit), 2)
    assert(r.map(_.start) == Vector(0, 3))
  }

  test("policy parse: runtime rejects unknown; tag CLI falls through to all") {
    assertThrows[IllegalArgumentException](Policy.fromString("bogus"))
    assert(Policy.fromStringTag("bogus") == Policy.All)
    assert(Policy.fromString("salience_max") == Policy.SalienceMax)
    assert(Policy.fromStringTag("leftmost_first") == Policy.LeftmostFirst)
  }

  test("salienceScore formula: salience * ln(count+1) in f32 (payload.rs:23-25)") {
    val p = Payload(100, 2.5f, 150, 2)
    assert(p.salienceScore == 2.5f * math.log(151.0).toFloat)
  }

  // ScalaCheck invariants — resolved outputs for the resolving policies are
  // non-overlapping, a subset of inputs, and bounded by max.
  private val genMatches: Gen[Vector[RawMatch]] = Gen.choose(0, 30).flatMap { n =>
    Gen.listOfN(n, for {
      s <- Gen.choose(0, 50)
      l <- Gen.choose(1, 6)
      p <- Gen.choose(0, 9)
    } yield RawMatch(s, s + l, p))
      // scan order like the automaton emits: end asc, longest first within end
      .map(_.sortBy(m => (m.end, m.start)).toVector)
  }
  private val pays = Array.tabulate(10)(i => Payload(i, 1.0f + i, 10 * i + 1, 2))

  for (policy <- Seq(Policy.LeftmostLongest, Policy.LeftmostFirst, Policy.SalienceMax)) {
    test(s"property: ${policy.name} output non-overlapping + subset of input") {
      checkProp(Prop.forAll(genMatches) { ms =>
        val r = Policies.resolve(ms, policy, pays)
        val sorted = r.sortBy(_.start)
        r.forall(ms.contains) && sorted.sliding(2).forall {
          case Seq(a, b) => a.end <= b.start
          case _ => true
        }
      })
    }
  }

  test("property: truncate bounds length and keeps a prefix") {
    checkProp(Prop.forAll(genMatches, Gen.choose(0, 10)) { (ms, max) =>
      val t = Policies.truncate(ms, max)
      t.length == math.min(ms.length, max) && t == ms.take(t.length)
    })
  }
}
