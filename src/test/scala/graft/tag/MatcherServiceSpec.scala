package graft.tag

import graft.SparkSuite

/** MatcherService = the reference's NativeMatcher surface (lib.rs:26-104):
 * load / hot-reload / stats / healthcheck parity. */
class MatcherServiceSpec extends SparkSuite {

  private val refDir = "/root/reference/examples/demo_output/artifacts"

  test("healthcheck and match throw 'Matcher not loaded' before load (lib.rs:38-41,90-96)") {
    val svc = new MatcherService
    val e1 = intercept[IllegalStateException](svc.healthcheck())
    assert(e1.getMessage == "Matcher not loaded")
    val e2 = intercept[IllegalStateException](svc.matchTextTokens(Seq("rat")))
    assert(e2.getMessage == "Matcher not loaded")
  }

  test("stats fields after load: version, loaded_at, num_patterns, heap, percentile stubs") {
    val before = System.currentTimeMillis()
    val svc = new MatcherService
    svc.load(refDir)
    assert(svc.healthcheck())
    val st = svc.stats
    assert(st.version == "demo-v1")
    assert(st.numPatterns == 7)
    assert(st.loadedAtMs >= before && st.loadedAtMs <= System.currentTimeMillis())
    assert(st.heapMb > 0.0 && st.heapMb < 1.0)
    // percentiles stubbed to zero exactly like matcher.rs:144-150
    assert((st.p50Us, st.p95Us, st.p99Us) == ((0L, 0L, 0L)))
    assert(st.hitsTotal == 0L)
    // hits accumulate (improvement over the reference's stubbed counter)
    val ms = svc.matchTextTokens(Seq("rat", "cdk10", "oligo"))
    assert(ms.nonEmpty)
    assert(svc.stats.hitsTotal == ms.length.toLong)
  }

  test("hot reload swaps the model atomically") {
    val svc = new MatcherService
    svc.load(refDir)
    val v1 = svc.stats.version
    val m = graft.artifact.TagModel.load(refDir)
    svc.reload(m.copy(manifest = m.manifest.copy(version = "demo-v2")))
    assert(v1 == "demo-v1" && svc.stats.version == "demo-v2")
    assert(svc.matchTextTokens(Seq("master", "mix")).nonEmpty)
  }
}
