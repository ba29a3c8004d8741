package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.kg.KgPipeline
import graft.mine.Miner
import graft.score.Scorer
import graft.tag.Tagger

/**
 * Production entry point: the full KG-construction pipeline as a
 * `spark-submit` application (the north rule's deployment surface — on a
 * cluster, `spark-submit --class graft.KgApp graft.jar --input ... --lake
 * ...`; master/executors come from spark-submit, the app never hardcodes a
 * master).
 *
 * The run is CHECKPOINTED AND RESUMABLE BY DEFAULT: it drives
 * [[KgPipeline.runCheckpointed]], so every layer (cleaned, background,
 * mentions, entities, triples) lands in the lake with per-partition lineage,
 * a killed run resumes by recomputing only missing buckets, and re-invoking
 * the same command on a finished lake is a zero-compute no-op that re-reads
 * the committed triple table (stage-completion markers). A changed input on
 * a half-built lake fails loudly via the corpus fingerprint gate rather than
 * silently mixing corpora — the operational contract a 10^12-doc run needs,
 * because at that scale the question is never "will it be interrupted" but
 * "what happens when it is".
 *
 * Prints ONE machine-parsable JSON metrics line to stdout (and optionally to
 * `--metrics-out`); everything else goes to logs. Layer row counts are read
 * back from the lake's committed parquet — they cost one count over columnar
 * data each and double as an end-to-end read-back validation of the commit.
 */
object KgApp {

  final case class AppArgs(
      input: Option[String] = None,   // parquet dir with the input_hint schema
      synthDocs: Option[Long] = None, // deterministic synthetic corpus instead
      lake: String = "",
      buckets: Int = 16,
      lang: String = "en",
      minN: Int = 2,
      maxN: Int = 5,
      minCount: Long = 10,
      method: String = "ratio",
      minSalience: Float = 2.0f,
      policy: String = "leftmost_longest",
      metricsOut: Option[String] = None) {
    def toConfig: KgPipeline.KgConfig = KgPipeline.KgConfig(
      lang = lang,
      mine = Miner.MineConfig(minN, maxN, minCount = minCount),
      score = Scorer.ScoreConfig(method, minSalience, minCount),
      tag = Tagger.TagConfig(policy = policy))
  }

  def parse(args: Array[String]): AppArgs = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"$msg\nusage: graft.KgApp (--input <parquet-dir> | --synth-docs <n>) " +
        "--lake <dir> [--buckets n] [--lang xx] [--min-n n] [--max-n n] " +
        "[--min-count n] [--method ratio|pmi|tfidf] [--min-salience x] " +
        "[--policy leftmost_longest|leftmost_first|salience_max|all] " +
        "[--metrics-out file]")
    var a = AppArgs()
    var i = 0
    while (i < args.length) {
      def v: String = {
        if (i + 1 >= args.length) fail(s"missing value for ${args(i)}")
        i += 1; args(i)
      }
      args(i) match {
        case "--input"        => a = a.copy(input = Some(v))
        case "--synth-docs"   => a = a.copy(synthDocs = Some(v.toLong))
        case "--lake"         => a = a.copy(lake = v)
        case "--buckets"      => a = a.copy(buckets = v.toInt)
        case "--lang"         => a = a.copy(lang = v)
        case "--min-n"        => a = a.copy(minN = v.toInt)
        case "--max-n"        => a = a.copy(maxN = v.toInt)
        case "--min-count"    => a = a.copy(minCount = v.toLong)
        case "--method"       => a = a.copy(method = v)
        case "--min-salience" => a = a.copy(minSalience = v.toFloat)
        case "--policy"       => a = a.copy(policy = v)
        case "--metrics-out"  => a = a.copy(metricsOut = Some(v))
        case other            => fail(s"unknown argument: $other")
      }
      i += 1
    }
    if (a.lake.isEmpty) fail("--lake is required")
    if (a.input.isEmpty == a.synthDocs.isEmpty)
      fail("exactly one of --input / --synth-docs is required")
    a
  }

  /** Run the checkpointed pipeline; returns the committed triple table and
   * the metrics JSON line. Separated from main() so tests drive it with the
   * suite's session. */
  def run(spark: SparkSession, a: AppArgs): (DataFrame, String) = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val pages = a.input match {
      case Some(path) =>
        // strict cast to the input_hint schema: a malformed corpus dir fails
        // here with a schema diff, not deep inside the pipeline
        spark.read.parquet(path)
          .select("url", "warc_ts", "html", "text", "lang")
          .as[graft.model.WebPage]
      case None => graft.corpus.Synth.corpus(spark, a.synthDocs.get)
    }
    val triples = KgPipeline.runCheckpointed(
      spark, pages, a.lake, a.buckets, cfg = a.toConfig)
    val lake = new graft.lake.LakeTable(spark, a.lake)
    def layerRows(stage: String): Long =
      if (lake.committedPartitions(stage).nonEmpty) lake.read(stage).count() else 0L
    val nTriples = triples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    // minimal JSON string escape: a lake path (or policy) containing a quote
    // or backslash must not yield an unparseable metrics line (round-4 advice)
    def esc(s: String): String = s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }
    val json =
      s"""{"app":"graft-kg","lake":"${esc(a.lake)}","docs":${layerRows("cleaned")},""" +
        s""""mentions":${layerRows("mentions")},"entities":${layerRows("entities")},""" +
        s""""triples":$nTriples,"policy":"${esc(a.policy)}","wall_sec":${f"$sec%.1f"}}"""
    (triples, json)
  }

  def main(args: Array[String]): Unit = {
    val a = parse(args)
    // master comes from spark-submit / the environment; local[*] only as the
    // no-args developer fallback. Shuffle parallelism is left to the cluster
    // conf + AQE coalescing — the app sets only what it owns.
    val spark = SparkSession.builder()
      .appName("graft-kg")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val (_, json) = run(spark, a)
      a.metricsOut.foreach { f =>
        java.nio.file.Files.write(java.nio.file.Paths.get(f),
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      println(json)
    } finally spark.stop()
  }
}
