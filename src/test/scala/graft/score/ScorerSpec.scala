package graft.score

import graft.SparkSuite
import graft.mine.Miner
import graft.model.Doc
import org.apache.spark.sql.functions._

/**
 * Scoring pins from the reference's committed example fixture
 * (examples/scoring jsonl files + score_config.json, re-created inline per
 * FIXTURES.md §2c) and behaviors pinned by spec/scorer_spec.rb.
 */
class ScorerSpec extends SparkSuite {
  import spark.implicits._

  private val domain = Seq(
    ("western blot", 4L), ("lysis buffer", 4L), ("rat cdk10", 4L),
    ("mouse cdk10", 3L), ("protein assay", 3L), ("cell culture", 3L),
    ("rat cdk10 oligo", 2L), ("pcr master mix", 2L), ("assay buffer", 2L),
    ("protein assay buffer", 2L), ("pcr master", 2L), ("master mix", 2L),
    ("cdk10 oligo", 2L), ("buffer for", 2L)).toDF("ngram", "count")

  private val background = Seq(
    ("for the", 125000L), ("in a", 95000L), ("of the", 110000L), ("to be", 88000L),
    ("and the", 72000L), ("is a", 68000L), ("on the", 55000L), ("with a", 48000L),
    ("at the", 42000L), ("from the", 38000L), ("rat cdk10", 5L), ("lysis buffer", 8L),
    ("western blot", 12L), ("protein assay", 15L), ("mouse cdk10", 3L),
    ("cell culture", 20L), ("pcr master", 2L), ("pcr master mix", 1L),
    ("buffer for", 150L)).toDF("ngram", "count")

  private val cfg = Scorer.ScoreConfig("ratio", 2.0f, 2, assignPhraseIds = true, 1000)

  private lazy val out = Scorer.score(domain, background, cfg)

  test("ratio pins: 'rat cdk10 oligo' kept at 2.0 (bg=0); 'pcr master mix' filtered at 1.0") {
    val m = out.select("ngram", "salience").as[(String, Float)].collect().toMap
    assert(m("rat cdk10 oligo") == 2.0f) // 2/(0+1)
    assert(!m.contains("pcr master mix")) // 2/(1+1) = 1.0 < 2.0
    assert(!m.contains("pcr master"))     // 2/(2+1) = 0.667
    assert(!m.contains("buffer for"))     // 2/151
    assert(!m.contains("rat cdk10"))      // 4/6 = 0.667
    assert(m("assay buffer") == 2.0f && m("master mix") == 2.0f && m("cdk10 oligo") == 2.0f)
    assert(m("protein assay buffer") == 2.0f)
    // stopword pairs never even reach scoring output (left join keeps domain only)
    assert(!m.contains("for the"))
  }

  test("sequential ids start at configured id in (salience desc, ngram asc) order") {
    val rows = out.select("phrase_id", "salience", "ngram")
      .as[(Long, Float, String)].collect().sortBy(_._1)
    assert(rows.head._1 == 1000L)
    assert(rows.map(_._1).toSeq == (1000L until 1000L + rows.length).toSeq)
    // total order respected
    val resorted = rows.sortBy(r => (-r._2, r._3))
    assert(resorted.map(_._1).toSeq == rows.map(_._1).toSeq)
    // custom start (spec/scorer_spec.rb:345-390)
    val custom = Scorer.score(domain, background, cfg.copy(startingPhraseId = 5000))
      .agg(min("phrase_id")).head().getLong(0)
    assert(custom == 5000L)
  }

  test("assign_phrase_ids=false omits the id column") {
    val noIds = Scorer.score(domain, background, cfg.copy(assignPhraseIds = false))
    assert(!noIds.columns.contains("phrase_id"))
  }

  test("pmi: bg=0 clamps to 10.0; known-value check in f32 (phrasekit_score.rs:231-246)") {
    val pm = Scorer.score(domain, background,
        cfg.copy(method = "pmi", minSalience = -100.0f))
      .select("ngram", "salience").as[(String, Float)].collect().toMap
    assert(pm("rat cdk10 oligo") == 10.0f && pm("assay buffer") == 10.0f)
    val totalDomain = 4 + 4 + 4 + 3 + 3 + 3 + 2 * 8 // 37
    val totalBg = 125000L + 95000 + 110000 + 88000 + 72000 + 68000 + 55000 +
      48000 + 42000 + 38000 + 5 + 8 + 12 + 15 + 3 + 20 + 2 + 1 + 150
    val want = (math.log((4.0 / totalDomain) / (5.0 / totalBg)) / math.log(2.0)).toFloat
    assert(math.abs(pm("rat cdk10") - want) < 1e-5f)
  }

  test("tfidf known value in f32 (phrasekit_score.rs:248-252)") {
    val tf = Scorer.score(domain, background,
        cfg.copy(method = "tfidf", minSalience = 0.0f))
      .select("ngram", "salience").as[(String, Float)].collect().toMap
    val d = 37.0
    val want = ((4.0 / d) * math.log((d + 1) / (5 + 1.0))).toFloat
    assert(math.abs(tf("rat cdk10") - want) < 1e-6f)
  }

  test("empty domain / empty background edges (spec/scorer_spec.rb:232-276)") {
    val empty = Seq.empty[(String, Long)].toDF("ngram", "count")
    assert(Scorer.score(empty, background, cfg).count() == 0)
    val noBg = Scorer.score(domain, empty, cfg)
    // every phrase has bg=0 → salience = count ≥ 2 passes
    assert(noBg.count() == domain.filter(col("count") >= 2).count())
  }

  test("invalid method rejected (phrasekit_score.rs:95-97)") {
    assertThrows[IllegalArgumentException](Scorer.ScoreConfig(method = "bogus"))
  }

  test("A4 scoring stats ride existing actions: correct values, zero extra jobs") {
    val (out, stats) = Scorer.scoreWithStats(domain, background, cfg)
    val scored = out.collect()
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val st = stats()
      Thread.sleep(500) // listener events are async
      assert(jobs == 0, "reading ScoringStats must not launch Spark jobs")
      assert(st.domainPhrases == 14)
      assert(st.backgroundPhrases == 19)
      assert(st.afterDomainFilter == domain.filter(col("count") >= cfg.minDomainCount).count())
      assert(st.afterSalienceFilter == scored.length.toLong)
      assert(st.totalDomainCount == 37L) // Σ domain counts (A2, pre-filter)
      assert(st.totalBackgroundCount ==
        background.agg(sum("count")).head.getLong(0))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
