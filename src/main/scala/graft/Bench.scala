package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.Synth
import graft.kg.KgPipeline

/**
 * Benchmark main (driver contract): prints ONE JSON line.
 *
 * Headline metric (BASELINE.json): docs/sec triple-extraction throughput of the
 * full KG pipeline over the deterministic synthetic Common-Crawl-style corpus,
 * measured at two parallelism levels — local[8] and local[32] — on IDENTICAL
 * input, with scaling efficiency = T(32) / (4 × T(8)). This is the sandbox
 * stand-in for the north rule's N-vs-4N-executor cluster criterion (no real
 * cluster is available; see BASELINE.md).
 *
 * Also reports per-query wall times for every SparkEntry query at the given SF
 * on local[SPARK_GRAFT_CPUS].
 */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Write the synthetic corpus to parquet once (untimed) — the pipeline is
   * benchmarked READING a lake table, like production; input synthesis is not
   * triple-extraction work. */
  private def corpusPath(nDocs: Long): String = {
    val path = s"/tmp/graft_bench_corpus_$nDocs"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val spark = session(8)
      try Synth.corpus(spark, nDocs, partitions = 64).write.mode("overwrite").parquet(path)
      finally spark.stop()
    }
    path
  }

  /** One full pipeline run over the parquet corpus; returns (docs/sec, triples). */
  private def pipelineRun(cores: Int, path: String, nDocs: Long): (Double, Long) = {
    val spark = session(cores)
    try {
      import spark.implicits._
      // warm JIT/classloading with a tiny run so the measured run is steady
      KgPipeline.build(spark, Synth.corpus(spark, 200, partitions = cores)).triples.count()
      val pages = spark.read.parquet(path).as[graft.model.WebPage]
      val t0 = System.nanoTime()
      val plan = KgPipeline.build(spark, pages)
      val triples = plan.triples.count()
      val secs = (System.nanoTime() - t0) / 1e9
      (nDocs / secs, triples)
    } finally {
      spark.stop() // a fresh session is built per phase
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // corpus size scales with SF: sf0.1 → 100k docs, sf0.01 → 10k
    val sf = sfDir.split("sf").lastOption.flatMap(s => scala.util.Try(s.toDouble).toOption)
      .getOrElse(0.01)
    val nDocs = math.max(2000L, (sf * 1000000L).toLong)

    // scaling evidence: same input, N and 4N local cores
    val path = corpusPath(nDocs)
    val (thr8, trip8) = pipelineRun(8, path, nDocs)
    val (thr32, trip32) = pipelineRun(32, path, nDocs)
    require(trip8 == trip32, s"nondeterministic triples: $trip8 vs $trip32")
    val efficiency = thr32 / (4.0 * thr8)

    // per-query timings at the driver-provided core count
    val spark = session(cpus)
    graft.queries.Queries.clearCache()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"docs_per_sec_triple_extraction","value":${f"$thr32%.1f"},"unit":"docs/sec","queries":$qs,"sf":"$sfDir","pipeline":{"n_docs":$nDocs,"triples":$trip32,"docs_per_sec_local8":${f"$thr8%.1f"},"docs_per_sec_local32":${f"$thr32%.1f"},"scaling_efficiency_8_to_32":${f"$efficiency%.3f"}},"queries_total_sec":${f"$total%.1f"}}""")
    spark.stop()
  }
}
