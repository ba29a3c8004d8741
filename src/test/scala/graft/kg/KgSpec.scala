package graft.kg

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.corpus.{Extract, Synth}
import graft.model.WebPage

/**
 * KG-layer correctness: connected components against hand-checked graphs,
 * LSH blocking against exact pairwise Jaccard, end-to-end mention parity vs a
 * single-threaded Scala oracle (the P/R ≥ 0.95 gate of BASELINE.json — exact
 * equality is asserted, which implies P = R = 1.0), byte-identity of extract,
 * and determinism of the triple output.
 */
class KgSpec extends SparkSuite {
  import spark.implicits._

  test("connected components: min-label over known graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 7L)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 7L -> 7L))
  }

  test("connected components: long chain converges via pointer jumping") {
    val n = 64
    val edges = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges, maxIter = 10).as[(Long, Long)].collect()
    assert(got.length == n + 1 && got.forall(_._2 == 0L))
  }

  test("LSH candidate edges ⊇ high-jaccard pairs and are exactly verified") {
    val phrases = Seq(
      (1L, Seq("rat", "cdk10", "oligo")),
      (2L, Seq("cdk10", "oligo", "rat")),        // same set → jaccard 1.0
      (3L, Seq("rat", "cdk10", "oligo", "kit")), // jaccard 0.75 with 1/2
      (4L, Seq("western", "blot")),              // unrelated
      (5L, Seq("western", "blot", "assay"))      // jaccard 2/3 with 4
    ).toDF("phrase_id", "tokens")
    val edges = Linker.candidateEdges(phrases,
        Linker.LinkConfig(numHashes = 32, bands = 16, jaccardThreshold = 0.5))
      .as[(Long, Long, Double)].collect().map(e => (e._1, e._2) -> e._3).toMap
    // with 16 bands of 2 rows, P(candidate | j>=0.66) is ~1 for these tiny sets
    assert(edges.contains((1L, 2L)) && edges((1L, 2L)) == 1.0)
    assert(edges.contains((4L, 5L)) && math.abs(edges((4L, 5L)) - 2.0 / 3) < 1e-9)
    assert(edges.contains((1L, 3L)) && edges.contains((2L, 3L)))
    assert(!edges.keySet.exists { case (a, b) => (a <= 3) != (b <= 3) }) // no cross-cluster edges
  }

  test("extract(html) === text byte-identical over the full synthetic corpus (input_hint invariant)") {
    val pages = Synth.corpus(spark, 2000)
    val bad = pages.toDF()
      .withColumn("extracted", Extract.extractText(col("html")))
      .filter(col("extracted") =!= col("text"))
      .count()
    assert(bad == 0)
  }

  test("synthetic corpus is deterministic and parallelism-independent") {
    val a = Synth.corpus(spark, 500, partitions = 2).collect().map(p => (p.url, p.text)).toSet
    val b = Synth.corpus(spark, 500, partitions = 7).collect().map(p => (p.url, p.text)).toSet
    assert(a == b)
  }

  // ---- end-to-end mention parity vs single-threaded oracle ----

  /** Reference-semantics oracle in plain Scala (validated against the committed
   * demo fixtures by DemoParitySpec, which exercises identical semantics). */
  private object Oracle {
    def tokenize(text: String): Array[String] =
      text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

    def mine(docs: Seq[Array[String]], minN: Int, maxN: Int, minCount: Long): Map[String, Long] = {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      for (toks <- docs; n <- minN to maxN; i <- 0 to toks.length - n)
        m.updateWith(toks.slice(i, i + n).mkString(" "))(c => Some(c.getOrElse(0L) + 1))
      m.filter(_._2 >= minCount).toMap
    }

    def scoreRatio(domain: Map[String, Long], bg: Map[String, Long],
        minSal: Float, minDom: Long): Map[String, Float] =
      domain.collect {
        case (g, dc) if dc >= minDom =>
          g -> (dc.toFloat / (bg.getOrElse(g, 0L) + 1).toFloat)
      }.filter(_._2 >= minSal)

    /** leftmost_longest tagging of one doc against a phrase set. */
    def tag(toks: Array[String], phrases: Set[String], maxN: Int): Seq[(Int, Int)] = {
      val raw = for {
        n <- 1 to maxN
        i <- 0 to toks.length - n
        if phrases.contains(toks.slice(i, i + n).mkString(" "))
      } yield (i, i + n)
      val sorted = raw.sortBy { case (s, e) => (s, -e) }
      val out = Seq.newBuilder[(Int, Int)]
      var covered = 0
      for ((s, e) <- sorted) if (s >= covered) { out += ((s, e)); covered = e }
      out.result()
    }
  }

  test("KG pipeline mentions == oracle mentions (P/R = 1.0 ≥ 0.95 gate)") {
    val n = 400
    val pages: Seq[WebPage] = (0L until n).map(Synth.page(Synth.Seed, _))
    val ds = Synth.corpus(spark, n)
    val cfg = KgPipeline.KgConfig()
    val result = KgPipeline.run(spark, ds, None, cfg)

    // oracle
    val en = pages.filter(_.lang == "en")
    val other = pages.filter(_.lang != "en")
    val domain = Oracle.mine(en.map(p => Oracle.tokenize(p.text)),
      cfg.mine.minN, cfg.mine.maxN, cfg.mine.minCount)
    val bg = Oracle.mine(other.map(p => Oracle.tokenize(p.text)),
      cfg.mine.minN, cfg.mine.maxN, math.max(1, cfg.mine.minCount / 2))
    val phr = Oracle.scoreRatio(domain, bg, cfg.score.minSalience, cfg.score.minDomainCount)
    val oracleMentions = (for {
      p <- en
      (s, e) <- Oracle.tag(Oracle.tokenize(p.text), phr.keySet, cfg.mine.maxN)
    } yield (p.url, s, e)).toSet

    val phraseById = result.phrases.select("phrase_id", "ngram")
      .as[(Long, String)].collect().toMap
    val gotMentions = result.mentions.select("url", "start", "end")
      .as[(String, Int, Int)].collect().toSet

    val tp = (gotMentions intersect oracleMentions).size.toDouble
    val precision = if (gotMentions.nonEmpty) tp / gotMentions.size else 1.0
    val recall = if (oracleMentions.nonEmpty) tp / oracleMentions.size else 1.0
    assert(oracleMentions.nonEmpty, "oracle produced no mentions — corpus too sparse")
    assert(precision == 1.0 && recall == 1.0,
      s"P=$precision R=$recall got=${gotMentions.size} want=${oracleMentions.size}")
    // phrase sets agree too
    assert(phraseById.values.toSet == phr.keySet)

    // KG invariants
    assert(result.numMentions == gotMentions.size || result.numMentions >= gotMentions.size) // dup spans per (url,start,end) impossible after leftmost_longest
    assert(result.numTriples > 0 && result.numEntities > 0)
    val trip = result.triples
    assert(trip.filter(col("pred") === "mentions").count() == result.numMentions)
    // co_occurs subjects/objects are entity ids with subj < obj
    val bad = trip.filter(col("pred") === "co_occurs" && col("subj") >= col("obj")).count()
    assert(bad == 0)
  }

  test("triples are deterministic across runs and partitionings") {
    val ds1 = Synth.corpus(spark, 200, partitions = 3)
    val ds2 = Synth.corpus(spark, 200, partitions = 9)
    val r1 = KgPipeline.run(spark, ds1).triples
      .select("subj", "pred", "obj", "url").as[(String, String, String, String)].collect().toSet
    val r2 = KgPipeline.run(spark, ds2).triples
      .select("subj", "pred", "obj", "url").as[(String, String, String, String)].collect().toSet
    assert(r1 == r2 && r1.nonEmpty)
  }

  test("contraction CC == iterative CC on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val edges = (1 to 200).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).toDF("src", "dst")
      val a = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap
      val b = ConnectedComponents.runIterative(edges).as[(Long, Long)].collect().toMap
      assert(a == b, s"trial $trial mismatch")
    }
  }
}
