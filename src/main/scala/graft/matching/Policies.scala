package graft.matching

import graft.model.{Payload, RawMatch}

/**
 * Overlap-resolution policies, re-expressed from the reference
 * (ext/phrasekit/src/policy.rs:49-135 and the tag CLI's inline variants at
 * ext/phrasekit/src/bin/phrasekit_tag.rs:179-211). These are row-local pure
 * functions applied to one document's match list inside `mapPartitions` —
 * not Spark `Window`s, because the state machine is per-document.
 *
 * Semantics pinned (SURVEY.md §2.6):
 *  - input match lists are in automaton scan order (end ascending), which makes a
 *    stable sort by start reproduce the reference's tie behavior exactly;
 *  - leftmost_longest: among same-start group take the longest, greedy left→right
 *    (policy.rs:63-89; equivalently tag CLI sort (start, -end) + greedy);
 *  - leftmost_first: stable start sort + greedy first-fit (policy.rs:91-103) —
 *    at equal start the SHORTEST wins (it was emitted first);
 *  - salience_max: runs of matches overlapping the run head; pick max by
 *    salience*ln(count+1) (payload.rs:23-25), last-max-wins on ties like Rust's
 *    `max_by`; resume at first match with start >= best.end (policy.rs:105-135);
 *  - all: no resolution — tag CLI fall-through (phrasekit_tag.rs:179,193);
 *  - truncation to `max` happens AFTER resolution (matcher.rs:100-104).
 */
sealed abstract class Policy(val name: String)
object Policy {
  case object LeftmostLongest extends Policy("leftmost_longest")
  case object LeftmostFirst extends Policy("leftmost_first")
  case object SalienceMax extends Policy("salience_max")
  case object All extends Policy("all")

  /** Runtime-matcher parse: unknown names are an error (policy.rs:10-19, lib.rs:42-43). */
  def fromString(s: String): Policy = s match {
    case "leftmost_longest" => LeftmostLongest
    case "leftmost_first"   => LeftmostFirst
    case "salience_max"     => SalienceMax
    case other => throw new IllegalArgumentException(s"Invalid policy: $other")
  }

  /** Tag-CLI parse: any string other than the two handled falls through to `all`
   * (phrasekit_tag.rs:179-207). */
  def fromStringTag(s: String): Policy = s match {
    case "leftmost_longest" => LeftmostLongest
    case "leftmost_first"   => LeftmostFirst
    case _                  => All
  }
}

object Policies {

  /** Resolve overlaps per `policy`; `payloads` indexed by dense pattern id
   * (needed only for salience_max). `matches` must be in scan order. */
  def resolve(matches: IndexedSeq[RawMatch], policy: Policy,
      payloads: Int => Payload): IndexedSeq[RawMatch] = {
    if (matches.isEmpty) return matches
    policy match {
      case Policy.LeftmostLongest =>
        // sort (start asc, end desc): head of each start group = longest
        val sorted = matches.sortBy(m => (m.start, -m.end))
        greedy(sorted)
      case Policy.LeftmostFirst =>
        val sorted = matches.sortBy(_.start) // stable: equal starts keep scan order
        greedy(sorted)
      case Policy.SalienceMax =>
        salienceMax(matches.sortBy(_.start), payloads)
      case Policy.All =>
        matches
    }
  }

  /** Greedy first-fit over a sorted list: accept when start >= covered end. */
  private def greedy(sorted: IndexedSeq[RawMatch]): IndexedSeq[RawMatch] = {
    val out = Vector.newBuilder[RawMatch]
    var coveredEnd = 0
    var i = 0
    while (i < sorted.length) {
      val m = sorted(i)
      if (m.start >= coveredEnd) { out += m; coveredEnd = m.end }
      i += 1
    }
    out.result()
  }

  private def salienceMax(sorted: IndexedSeq[RawMatch],
      payloads: Int => Payload): IndexedSeq[RawMatch] = {
    @inline def overlaps(a: RawMatch, b: RawMatch): Boolean =
      !(a.end <= b.start || b.end <= a.start)
    val out = Vector.newBuilder[RawMatch]
    var i = 0
    while (i < sorted.length) {
      var j = i + 1
      while (j < sorted.length && overlaps(sorted(j), sorted(i))) j += 1
      // last-max-wins on score ties, mirroring Rust max_by
      var best = sorted(i)
      var bestScore = payloads(best.patternId).salienceScore
      var k = i + 1
      while (k < j) {
        val sc = payloads(sorted(k).patternId).salienceScore
        if (sc >= bestScore) { best = sorted(k); bestScore = sc }
        k += 1
      }
      out += best
      // resume at first match (from i) with start >= best.end
      var next = i
      while (next < sorted.length && sorted(next).start < best.end) next += 1
      i = if (next == i) sorted.length else next
    }
    out.result()
  }

  /** Post-resolution truncation (matcher.rs:100-104; phrasekit_tag.rs:209-211). */
  def truncate(ms: IndexedSeq[RawMatch], max: Int): IndexedSeq[RawMatch] =
    if (ms.length > max) ms.take(max) else ms
}
