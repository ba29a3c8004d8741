package graft.matching

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.model.RawMatch

/**
 * Automaton pins from the reference's spec fixtures (fixture_builder.rs:37-119,
 * spec/phrasekit_spec.rb) plus a brute-force equivalence property.
 */
class AhoCorasickSpec extends AnyFunSuite {

  // 3-pattern fixture: machine=100 learning=101 algorithms=102 deep=200
  private val fixturePatterns = Array(
    Array(100, 101),       // "machine learning"
    Array(200, 101),       // "deep learning"
    Array(100, 101, 102))  // "machine learning algorithms"
  private val ac = AhoCorasick.build(fixturePatterns)

  test("overlapping matches: [100,101,102] yields both ML and MLA (spec/phrasekit_spec.rb:90-97)") {
    val ms = ac.findOverlapping(Array(100, 101, 102))
    assert(ms.toSet == Set(RawMatch(0, 2, 0), RawMatch(0, 3, 2)))
    // scan order: end ascending
    assert(ms.map(_.end).toSeq == ms.map(_.end).toSeq.sorted)
  }

  test("unknown tokens (id 0) never match (spec/phrasekit_spec.rb:121-135)") {
    assert(ac.findOverlapping(Array(0, 0, 0)).isEmpty)
    assert(ac.findOverlapping(Array.empty[Int]).isEmpty)
    // suffix pattern still fires after an unknown
    assert(ac.findOverlapping(Array(0, 200, 101)).toSet == Set(RawMatch(1, 3, 1)))
  }

  test("suffix pattern via fail links: [100, 200, 101] finds deep learning only") {
    assert(ac.findOverlapping(Array(100, 200, 101)).toSet == Set(RawMatch(1, 3, 1)))
  }

  test("repeated hits across the stream") {
    val ms = ac.findOverlapping(Array(100, 101, 100, 101, 102))
    assert(ms.toSet == Set(RawMatch(0, 2, 0), RawMatch(2, 4, 0), RawMatch(2, 5, 2)))
  }

  test("duplicate patterns are a build error (phrasekit_build.rs:141-143)") {
    assertThrows[IllegalArgumentException](
      AhoCorasick.build(Array(Array(1, 2), Array(1, 2))))
  }

  test("property: equals brute-force sliding-window matching") {
    val genPatterns = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 4).flatMap(l =>
        Gen.listOfN(l, Gen.choose(1, 5)).map(_.toArray)))
        .map(_.map(_.toSeq).distinct.map(_.toArray).toArray))
    val genText = Gen.choose(0, 40).flatMap(l => Gen.listOfN(l, Gen.choose(0, 5)).map(_.toArray))
    val prop = Prop.forAll(genPatterns, genText) { (pats, text) =>
      val trie = AhoCorasick.build(pats)
      val got = trie.findOverlapping(text).map(m => (m.start, m.end, m.patternId)).toSet
      val want = (for {
        p <- pats.indices
        s <- 0 to text.length - pats(p).length
        if text.slice(s, s + pats(p).length).sameElements(pats(p))
      } yield (s, s + pats(p).length, p)).toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
