package graft.corpus

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.WebPage

/**
 * Deterministic synthetic Common-Crawl-style corpus (BASELINE.json input_hint:
 * url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
 *
 * Fully distributed (`spark.range(n).map`) and a pure function of (seed, row id):
 * the same (seed, n) always produces byte-identical rows regardless of
 * parallelism or partitioning — required for the determinism contract
 * (SURVEY.md §7.7) and for the local[8]-vs-local[32] scaling benchmark to run on
 * identical input.
 *
 * Domains follow a Zipf-like head distribution to exercise skew handling; texts
 * inject known multi-token phrases from the reference's demo vocabulary
 * (examples/demo_output/corpus.jsonl) between stopword/noise tokens, so mining,
 * scoring and tagging all have real signal.
 */
object Synth {

  val Seed = 42L

  // splitmix64 — standard public-domain mixing constants
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d493fddb7955bdL
    z ^ (z >>> 31)
  }
  @inline private def rng(seed: Long, id: Long, field: Long): Long =
    mix(mix(mix(seed) ^ id) ^ field)
  @inline private def unit(r: Long): Double = ((r >>> 11).toDouble) / (1L << 53).toDouble

  /** Multi-token phrases (from the reference demo fixtures) injected into texts. */
  val Phrases: Array[Array[String]] = Array(
    Array("rat", "cdk10"), Array("rat", "cdk10", "oligo"),
    Array("protein", "assay"), Array("protein", "assay", "buffer"),
    Array("assay", "buffer"), Array("master", "mix"),
    Array("lysis", "buffer"), Array("western", "blot"),
    Array("cell", "culture"), Array("pcr", "master", "mix"))

  val Stopwords: Array[String] = Array(
    "the", "a", "of", "in", "for", "to", "and", "is", "was", "on", "with", "at")

  val Noise: Array[String] = Array(
    "sample", "reagent", "protocol", "analysis", "procedure", "preparation",
    "experiment", "levels", "expression", "guidelines", "contains", "add",
    "used", "performed", "critical", "according", "prepare")

  val Langs: Array[String] = Array("en", "en", "en", "en", "en", "en", "en", "en", "en", "de", "es", "fr", "zh")

  val NumDomains = 1000

  /** Pure row generator: WebPage for (seed, id). */
  def page(seed: Long, id: Long): WebPage = {
    // Zipf-ish head: cubing the uniform pushes mass to low domain indices
    val u = unit(rng(seed, id, 1))
    val dom = (NumDomains * u * u * u).toInt.min(NumDomains - 1)
    val url = s"https://site$dom.example.com/page/$id"
    val warcTs = new Timestamp(1735689600000L + id * 1000L) // 2025-01-01T00:00:00Z + id sec
    val lang = Langs(((rng(seed, id, 2) >>> 33) % Langs.length).toInt)
    val len = 5 + (unit(rng(seed, id, 3)) * 55).toInt
    val sb = new StringBuilder
    var i = 0
    var k = 0L
    while (i < len) {
      val r = rng(seed, id, 100 + k)
      k += 1
      val sel = unit(r)
      if (sb.nonEmpty) sb.append(' ')
      if (sel < 0.25) { // inject a known phrase
        val p = Phrases((r >>> 17).toInt.abs % Phrases.length)
        sb.append(p.mkString(" "))
        i += p.length
      } else if (sel < 0.60) {
        sb.append(Stopwords((r >>> 17).toInt.abs % Stopwords.length)); i += 1
      } else {
        sb.append(Noise((r >>> 17).toInt.abs % Noise.length)); i += 1
      }
    }
    val text = sb.toString
    WebPage(url, warcTs, Extract.wrapHtml(text), text, lang)
  }

  /** Distributed corpus of n pages. */
  def corpus(spark: SparkSession, n: Long, seed: Long = Seed,
      partitions: Int = 0): Dataset[WebPage] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n)
    base.map(id => page(seed, id))
  }
}
