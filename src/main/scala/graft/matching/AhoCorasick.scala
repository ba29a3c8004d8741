package graft.matching

import scala.collection.mutable
import graft.model.RawMatch

/**
 * Aho-Corasick automaton over token-ID sequences.
 *
 * Re-expression of the reference's daachorse `DoubleArrayAhoCorasick<u32>`
 * (ext/phrasekit/src/matcher.rs:27-32, 67-105). The reference byte-encodes each
 * token as `le32(token_id) ++ le32(separator)` purely because daachorse is a byte
 * automaton (ext/phrasekit/src/bin/phrasekit_build.rs:297-304); we match at token
 * level directly, keeping identical (start, end) token-span semantics.
 *
 * Matches are emitted in scan order (end position ascending), which is the property
 * the reference's policy resolution relies on (stable sort by start preserves
 * end-ascending order within equal starts — see Policies).
 *
 * Layout: CSR-style flattened goto edges (sorted token IDs per state + binary
 * search), BFS fail links, and output links to the nearest suffix state that
 * terminates a pattern. Compact, cache-friendly, Serializable — built once on the
 * driver and shipped to executors via `sparkContext.broadcast`.
 *
 * Duplicate patterns are a build error, mirroring daachorse's rejection
 * (ext/phrasekit/src/bin/phrasekit_build.rs:141-143, docs/BUILDER.md:123).
 */
final class AhoCorasick private (
    val numStates: Int,
    private val edgeOffsets: Array[Int], // numStates+1; edges of state s in [off(s), off(s+1))
    private val edgeTokens: Array[Int],  // sorted within each state's range
    private val edgeTargets: Array[Int],
    private val fail: Array[Int],
    private val patternAt: Array[Int],   // pattern index terminating at state, or -1
    private val outputLink: Array[Int],  // nearest proper-suffix state with a pattern, or -1
    val patternLengths: Array[Int],
    /** token-id patterns by dense value — retained so the artifact sink can
     * serialize the automaton (Daac.encodePatterns); the reference's .daac
     * file likewise carries the full pattern byte strings */
    val patterns: Array[Array[Int]])
  extends Serializable {

  def numPatterns: Int = patternLengths.length

  /** goto(state, token) without fail-following; -1 if absent. */
  @inline private def rawGoto(state: Int, token: Int): Int = {
    var lo = edgeOffsets(state)
    var hi = edgeOffsets(state + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val t = edgeTokens(mid)
      if (t == token) return edgeTargets(mid)
      else if (t < token) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Full transition with fail-link fallback (root loops on itself). */
  @inline private def step(state0: Int, token: Int): Int = {
    var state = state0
    var g = rawGoto(state, token)
    while (g < 0 && state != 0) {
      state = fail(state)
      g = rawGoto(state, token)
    }
    if (g < 0) 0 else g
  }

  /**
   * All overlapping matches against `tokens`, in scan order: end ascending, and
   * within one end position longest-first (node itself, then suffix output links).
   * Half-open token spans [start, end).
   */
  def findOverlapping(tokens: Array[Int]): mutable.ArrayBuffer[RawMatch] = {
    val out = new mutable.ArrayBuffer[RawMatch]()
    var state = 0
    var i = 0
    while (i < tokens.length) {
      state = step(state, tokens(i))
      var s = state
      while (s > 0) {
        val p = patternAt(s)
        if (p >= 0) out += RawMatch(i + 1 - patternLengths(p), i + 1, p)
        s = outputLink(s)
      }
      i += 1
    }
    out
  }
}

object AhoCorasick {

  /** Build from token-ID patterns; pattern value = dense input index (as the
   * reference: pattern order == payload order, phrasekit_build.rs:137-160). */
  def build(patterns: Array[Array[Int]]): AhoCorasick = {
    require(patterns.forall(_.nonEmpty), "empty pattern")
    // trie with per-node hash goto
    val gotoMaps = mutable.ArrayBuffer(mutable.HashMap.empty[Int, Int])
    val patAt = mutable.ArrayBuffer(-1)
    var pi = 0
    while (pi < patterns.length) {
      val pat = patterns(pi)
      var state = 0
      var j = 0
      while (j < pat.length) {
        val tok = pat(j)
        state = gotoMaps(state).getOrElseUpdate(tok, {
          gotoMaps += mutable.HashMap.empty[Int, Int]
          patAt += -1
          gotoMaps.length - 1
        })
        j += 1
      }
      require(patAt(state) < 0,
        s"duplicate pattern at input index $pi (duplicates are a build error, as in the reference)")
      patAt(state) = pi
      pi += 1
    }
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val outLink = new Array[Int](n)
    java.util.Arrays.fill(outLink, -1)
    // BFS fail links
    val queue = new mutable.ArrayDeque[Int]()
    for ((_, child) <- gotoMaps(0)) { fail(child) = 0; queue.append(child) }
    while (queue.nonEmpty) {
      val u = queue.removeHead()
      outLink(u) =
        if (patAt(fail(u)) >= 0) fail(u)
        else outLink(fail(u))
      for ((tok, v) <- gotoMaps(u)) {
        var f = fail(u)
        var g = gotoMaps(f).getOrElse(tok, -1)
        while (g < 0 && f != 0) { f = fail(f); g = gotoMaps(f).getOrElse(tok, -1) }
        fail(v) = if (g < 0) 0 else g
        queue.append(v)
      }
    }
    // freeze to CSR
    val offsets = new Array[Int](n + 1)
    var s = 0
    while (s < n) { offsets(s + 1) = offsets(s) + gotoMaps(s).size; s += 1 }
    val eTok = new Array[Int](offsets(n))
    val eTgt = new Array[Int](offsets(n))
    s = 0
    while (s < n) {
      val sorted = gotoMaps(s).toArray.sortBy(_._1)
      var k = 0
      while (k < sorted.length) {
        eTok(offsets(s) + k) = sorted(k)._1
        eTgt(offsets(s) + k) = sorted(k)._2
        k += 1
      }
      s += 1
    }
    new AhoCorasick(n, offsets, eTok, eTgt, fail, patAt.toArray, outLink,
      patterns.map(_.length), patterns)
  }
}
