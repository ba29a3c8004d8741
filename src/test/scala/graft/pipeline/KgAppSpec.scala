package graft.pipeline

import java.nio.file.Files
import graft.{KgApp, SparkSuite}

/** The spark-submit application surface: arg parsing, end-to-end run over a
 * parquet corpus of the input_hint schema, metrics line, and the no-op
 * resume contract (rerunning the same command on a finished lake re-reads
 * the committed triples without new commits). */
class KgAppSpec extends SparkSuite {

  test("arg parsing: required flags, unknown flags, input xor synth") {
    val ok = KgApp.parse(Array("--input", "/x", "--lake", "/y",
      "--policy", "salience_max", "--min-count", "3"))
    assert(ok.input.contains("/x") && ok.lake == "/y" &&
      ok.policy == "salience_max" && ok.minCount == 3L)
    assert(intercept[IllegalArgumentException](KgApp.parse(Array("--input", "/x")))
      .getMessage.contains("--lake is required"))
    assert(intercept[IllegalArgumentException](
      KgApp.parse(Array("--lake", "/y"))).getMessage.contains("exactly one of"))
    assert(intercept[IllegalArgumentException](
      KgApp.parse(Array("--input", "/x", "--synth-docs", "5", "--lake", "/y")))
      .getMessage.contains("exactly one of"))
    assert(intercept[IllegalArgumentException](
      KgApp.parse(Array("--frobnicate", "/x", "--lake", "/y")))
      .getMessage.contains("unknown argument"))
    assert(intercept[IllegalArgumentException](
      KgApp.parse(Array("--input"))).getMessage.contains("missing value"))
  }

  test("end-to-end over a parquet corpus + zero-commit resume") {
    val dir = Files.createTempDirectory("kgapp").toString
    val corpus = s"$dir/corpus"
    graft.corpus.Synth.corpus(spark, 400).write.parquet(corpus)
    val metricsFile = s"$dir/metrics.json"
    val args = KgApp.parse(Array("--input", corpus, "--lake", s"$dir/lake",
      "--min-count", "3", "--min-salience", "1.5",
      "--metrics-out", metricsFile))

    val (triples, json) = KgApp.run(spark, args)
    val n = triples.count()
    assert(n > 0, "pipeline emitted no triples")
    assert(json.contains(s""""triples":$n""") && json.contains(""""app":"graft-kg""""))
    // the metrics line carries real layer counts read back from the lake
    assert(json.contains(""""docs":""") && !json.contains(""""docs":0,"""))

    // rerun of the SAME command: stage markers short-circuit to the committed
    // table — same triples, and NOT ONE new snapshot in the lake log
    val lake = new graft.lake.LakeTable(spark, s"$dir/lake")
    val versionsBefore = lake.snapshots.length
    val (again, _) = KgApp.run(spark, args)
    assert(again.count() == n)
    assert(new graft.lake.LakeTable(spark, s"$dir/lake").snapshots.length == versionsBefore,
      "no-op resume must not write new snapshots")
  }
}
