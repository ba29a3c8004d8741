package graft.kg

import org.apache.spark.sql.functions._
import graft.SparkSuite

/**
 * Graph analytics over the KG edge list: degrees/PageRank/triangles against
 * hand-checked graphs, the fixed-point-integer determinism contract (rank mass
 * conservation, symmetry, partition-order independence), and the plan-shape
 * pin for the single-shuffle degree aggregate.
 */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  // path graph 1-2-3 plus isolated edge 10-11, weights distinguish endpoints
  private def pathEdges =
    Seq((1L, 2L, 3L), (2L, 3L, 5L), (10L, 11L, 7L)).toDF("src", "dst", "w")

  test("degrees: degree and weighted degree over a path + isolated edge") {
    val got = Graph.degrees(pathEdges).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((1L, 3L)), 2L -> ((2L, 8L)), 3L -> ((1L, 5L)),
      10L -> ((1L, 7L)), 11L -> ((1L, 7L))))
  }

  test("degrees: single aggregation exchange, no join") {
    val plan = Graph.degrees(pathEdges).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"degrees must plan exactly one shuffle (partial-agg → exchange → final), got:\n$plan")
    assert(!plan.contains("Join"), s"degrees must not plan a join:\n$plan")
  }

  test("pageRank: uniform on a vertex-transitive graph (4-cycle)") {
    val cycle = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(cycle, iters = 3).as[(Long, Long)].collect().toMap
    // every vertex is equivalent → identical rank; mass ≈ SCALE up to floor loss
    assert(r.values.toSet.size == 1, s"cycle ranks must be uniform: $r")
    val total = r.values.sum
    assert(total <= 1000000000000L && total > 1000000000000L - 100L, s"mass drift: $total")
  }

  test("pageRank: star center outranks leaves; leaves tie; exact recurrence") {
    // star: center 0, leaves 1..4
    val star = (1L to 4L).map(l => (0L, l, 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRank(star, iters = 2).as[(Long, Long)].collect().toMap
    val scale = 1000000000000L
    val n = 5L
    val teleport = (15L * scale) / (100L * n)
    // hand-rolled recurrence: r0 = scale/5 for all; deg(center)=4, deg(leaf)=1
    val r0 = scale / n
    def step(c: Long, l: Long): (Long, Long) = {
      val cNew = teleport + 4L * ((85L * l) / 100L)        // 4 leaves, deg 1
      val lNew = teleport + (85L * c) / (100L * 4L)        // center, deg 4
      (cNew, lNew)
    }
    val (c1, l1) = step(r0, r0)
    val (c2, l2) = step(c1, l1)
    assert(r(0L) == c2, s"center rank ${r(0L)} != expected $c2")
    assert((1L to 4L).forall(r(_) == l2), s"leaf ranks ${r} != expected $l2")
    assert(r(0L) > r(1L))
  }

  test("pageRank: bit-identical across partition layouts (integer contract)") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (1L, 4L, 1L),
      (1L, 3L, 1L), (4L, 5L, 3L)).toDF("src", "dst", "w")
    val a = Graph.pageRank(edges.repartition(1), iters = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Graph.pageRank(edges.repartition(7, col("w")), iters = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b, "fixed-point integer PageRank must not depend on partitioning")
  }

  test("triangles: K4 counts every vertex in C(3,2) triangles; path has none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w")
    val got = Graph.triangles(k4).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(Graph.triangles(pathEdges).count() == 0L)
  }

  test("triangles: degree orientation is count-invariant on a skewed star+chord") {
    // star center 0 (deg 5) + chord (1,2): one triangle {0,1,2}; the center is
    // the HIGHEST-degree corner, so after degree orientation it pivots no
    // wedges — the triangle is found from corner 1
    val g = ((1L to 5L).map(l => (0L, l, 1L)) :+ (1L, 2L, 1L)).toDF("src", "dst", "w")
    val got = Graph.triangles(g).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("linkPredict: maxPivotDegree drops wedges mediated beyond the cap") {
    val star = Seq((0L, 1L, 5L), (0L, 2L, 3L), (0L, 3L, 1L)).toDF("src", "dst", "w")
    val exact = Graph.linkPredict(star).as[(Long, Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
    // cap 2 keeps the center's strongest edges (w=5, w=3) → only (1,2) remains
    val capped = Graph.linkPredict(star, maxPivotDegree = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L, 1L)))
  }

  test("linkPredict: the hub cap is ON by default (pivot beyond 64 edges prunes)") {
    // star center 0 with 70 leaves (distinct weights): exact mode predicts
    // every leaf pair C(70,2); the DEFAULT keeps the center's 64 strongest
    // edges → C(64,2) — the guard must not be opt-in (round-4 verdict #2)
    val star = (1L to 70L).map(l => (0L, l, l)).toDF("src", "dst", "w")
    assert(Graph.linkPredict(star, maxPivotDegree = 0).count() == 70L * 69L / 2L)
    val capped = Graph.linkPredict(star)
    assert(capped.count() == 64L * 63L / 2L)
    // kept edges are the strongest by weight: leaves 7..70 survive
    assert(capped.agg(min(col("src"))).head.getLong(0) == 7L)
  }

  test("triangles/linkPredict: edge projection materialized once (no repeated degree subtree)") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w")
    // the oriented/symmetric projections are localCheckpointed inside the
    // operators, so the degree-join subtree runs ONCE in the checkpoint job
    // and the wedge join's logical plan carries only the FINAL aggregate —
    // without the checkpoint the degree groupBy appeared once per leg
    val triAggs = Graph.triangles(k4).queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }
    assert(triAggs.size == 1,
      "triangles must plan exactly the final n_tri aggregate (oriented list pre-materialized)")
    val lpAggs = Graph.linkPredict(k4).queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }
    assert(lpAggs.size == 1,
      "linkPredict must plan exactly the pair-count aggregate (sym list pre-materialized)")
  }

  test("linkPredict: common neighbors of non-adjacent pairs; complete graph predicts nothing") {
    // path 1-2-3: (1,3) share pivot 2 and are non-adjacent → predicted, cn=1;
    // 10-11 isolated edge → nothing; K4 → every pair adjacent → nothing
    val got = Graph.linkPredict(pathEdges).as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 1L)))
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w")
    assert(Graph.linkPredict(k4).count() == 0L)
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) each share two pivots
    val sq = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 1L))
      .toDF("src", "dst", "w")
    val diag = Graph.linkPredict(sq).as[(Long, Long, Long)].collect().toSet
    assert(diag == Set((1L, 3L, 2L), (2L, 4L, 2L)))
  }

  test("pipeline graph layer: KgPipeline edges feed the analytics end-to-end") {
    val pages = graft.corpus.Synth.corpus(spark, 120)
    val plan = KgPipeline.build(spark, pages)
    val edges = KgPipeline.cooccurEdges(plan).persist()
    val nEdges = edges.count()
    assert(nEdges > 0, "synthetic corpus must produce co-occurrence edges")
    val nNodes = Graph.degrees(edges).count()
    assert(nNodes > 1)
    val pr = Graph.pageRank(edges, iters = 2)
    assert(pr.count() == nNodes)
    val mass = pr.agg(sum(col("rank_e12"))).head.getLong(0)
    assert(mass <= 1000000000000L && mass > 999000000000L, s"rank mass drifted: $mass")
    edges.unpersist()
  }

  test("cooccurEdges: pair weights over capped per-doc entity sets") {
    val mentions = Seq(
      // doc a: entities 100, 200 (via phrases 1→100, 2→200), phrase 3 also →200
      ("doc://a", 0, 1L), ("doc://a", 5, 2L), ("doc://a", 9, 3L),
      // doc b: entities 100, 200, 300
      ("doc://b", 0, 1L), ("doc://b", 3, 2L), ("doc://b", 7, 4L),
      // doc c: entity 100 only → no pair
      ("doc://c", 2, 1L)
    ).toDF("url", "start", "phrase_id")
      .withColumn("warc_ts", lit(java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
      .withColumn("end", col("start") + 1)
      .withColumn("label", lit("PHRASE"))
    val entityMap = Seq((1L, 100L), (2L, 200L), (3L, 200L), (4L, 300L))
      .toDF("phrase_id", "entity_id")
    val got = Graph.degrees(Triples.cooccurEdges(mentions, entityMap))
    val edges = Triples.cooccurEdges(mentions, entityMap)
      .as[(Long, Long, Long)].collect().toSet
    // (100,200) in docs a+b → w=2; (100,300) and (200,300) in doc b → w=1
    assert(edges == Set((100L, 200L, 2L), (100L, 300L, 1L), (200L, 300L, 1L)))
    val deg = got.as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(deg(100L) == ((2L, 3L)) && deg(200L) == ((2L, 3L)) && deg(300L) == ((2L, 2L)))
  }
}
