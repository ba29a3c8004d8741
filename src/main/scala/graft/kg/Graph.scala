package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over the materialized KG edge list (north rule "graph
 * materialize"): degree statistics, PageRank, and triangle counting over the
 * undirected weighted entity co-occurrence graph produced by
 * [[Triples.cooccurEdges]].
 *
 * All three operators are pure Dataset/Catalyst plans (no RDDs, no GraphX):
 * joins + aggregations that AQE can re-plan at runtime, so they inherit
 * broadcast conversion, skew-join splitting, and partial aggregation for free.
 *
 * Determinism contract (oracle-grade): PageRank uses FIXED-POINT INTEGER
 * arithmetic — every rank is a scaled BIGINT and every per-edge contribution
 * is an integral division — so results are bit-identical regardless of
 * partitioning, aggregation order, or engine (integer addition is exactly
 * associative/commutative; double summation is not). This is what lets the
 * driver hash-compare against a DuckDB oracle with `check_exact`, and at
 * cluster scale it makes reruns/resume byte-reproducible.
 */
object Graph {

  /** Node degree + weighted degree over an undirected edge list.
   * One aggregation shuffle (union of the two endpoint projections feeds a
   * single partial-agg → exchange → final-agg); no joins.
   * @param edges DataFrame(src, dst, w) with each undirected pair once
   * @return DataFrame(entity_id, degree, wdeg) */
  def degrees(edges: DataFrame): DataFrame = {
    val sym = symmetrize(edges)
    sym.groupBy(col("a").as("entity_id"))
      .agg(count(lit(1)).as("degree"), sum(col("w")).as("wdeg"))
  }

  /** Fixed-point integer PageRank over the undirected graph, damping 0.85.
   *
   * rank₀(v)   = SCALE div N
   * rankᵢ₊₁(v) = (15·SCALE) div (100·N) + Σ_{u∈nbr(v)} (85·rankᵢ(u)) div (100·deg(u))
   *
   * All quantities are BIGINT; `div` is integral division, so the result is
   * exactly reproducible under any aggregation order (bit-identical across
   * Spark and the DuckDB oracle). With SCALE = 10¹² the per-division floor
   * loss is ≤ deg(u) parts in 10¹² per node per iteration — far below any
   * ranking-relevant precision — and 85·rank ≤ 8.5·10¹³ never overflows.
   *
   * Plan shape per iteration: ranks ⋈ edges on the source endpoint (shuffle
   * hash / sort-merge on `a`, or broadcast when ranks are small), then one
   * aggregation shuffle on the destination. The degree-annotated symmetric
   * edge list is computed once, cached by the caller if iterating many times;
   * every node of an undirected graph has deg ≥ 1, so there is no dangling
   * mass and the total rank stays within N floor-losses of SCALE. For deep
   * iteration counts at cluster scale, localCheckpoint every ~10 iterations
   * truncates the growing lineage (not needed at the 3–5 iterations typical
   * for co-occurrence salience).
   *
   * @param edges DataFrame(src, dst, w) with each undirected pair once
   * @param iters number of power iterations (≥ 0; 0 returns the uniform init)
   * @param scale fixed-point scale (rank of 1.0 ≡ N·scale mass)
   * @return DataFrame(entity_id, rank_e12) — rank scaled by `scale` */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1000000000000L): DataFrame = {
    val spark = edges.sparkSession
    val sym = symmetrize(edges)
    val deg = sym.groupBy("a").agg(count(lit(1)).as("d"))
    // N is a single driver scalar (one aggregate job) — it parameterizes the
    // teleport constant, which must be a literal for integer exactness.
    val n = deg.count()
    require(n > 0, "pageRank over an empty edge list")
    val teleport = (15L * scale) / (100L * n)
    val adj = sym.join(deg, "a").select(col("a"), col("b"), col("d")).persist()
    try {
      var ranks = deg.select(col("a").as("id"), lit(scale / n).as("r"))
      for (_ <- 1 to iters) {
        // 2 exchanges per iteration (ranks onto the source endpoint, then the
        // destination aggregate). The teleport folds INTO the aggregate: in
        // an undirected graph every node has deg ≥ 1, so every node receives
        // at least one contribution row and no node-table re-join is needed —
        // the join-back formulation costs two more exchanges per iteration
        // (node projection + deg recompute), which at small scale dominates
        // as scheduling fixed cost and at cluster scale doubles the rounds.
        // (Round-6 note: an explicit size-gated broadcast(ranks) per
        // iteration was tried and MEASURED SLOWER on the warm bench twice
        // (+0.15 s / +0.26 s on kg_pagerank) — AQE already converts these
        // tiny-rank joins to broadcast at runtime from exact shuffle
        // statistics, and forcing the hint only serialized the per-iteration
        // broadcast builds; reverted, see OPTIMIZATION_r06.md.)
        ranks = adj.join(ranks, adj("a") === ranks("id"))
          .select(col("b"), expr("(85 * r) div (100 * d)").as("c"))
          .groupBy(col("b").as("id"))
          .agg((lit(teleport) + sum(col("c"))).as("r"))
      }
      // materialize before unpersisting the adjacency the lineage depends on
      ranks.select(col("id").as("entity_id"), col("r").as("rank_e12")).localCheckpoint()
    } finally adj.unpersist()
  }

  /** Per-node triangle count via DEGREE-ORIENTED wedge enumeration — the
   * standard skew defense for power-law graphs, implemented rather than
   * assumed: every edge is re-oriented from its lower endpoint under the
   * total order ≺ = (degree, id), so each triangle x ≺ y ≺ z is enumerated
   * exactly once as the wedge x→y, x→z closed by y→z, and every wedge PIVOT
   * is the lowest-degree corner — out-degrees after orientation are bounded
   * by √(2·|E|) regardless of how hubby the raw degree distribution is (a
   * head entity co-occurring with millions of others pivots no wedges; its
   * triangles are counted from their low-degree corners). The per-node
   * counts are orientation-invariant, so the id-oriented SQL oracle still
   * matches cell-exactly.
   * @param edges DataFrame(src, dst, w), src < dst, each pair once
   * @return DataFrame(entity_id, n_tri) — nodes in ≥ 1 triangle */
  def triangles(edges: DataFrame): DataFrame = {
    val d = symmetrize(edges).groupBy("a").agg(count(lit(1)).as("dg"))
    val withDeg = edges.select("src", "dst")
      .join(d.select(col("a").as("src"), col("dg").as("dsrc")), "src")
      .join(d.select(col("a").as("dst"), col("dg").as("ddst")), "dst")
    // The oriented projection feeds all three legs of the wedge join;
    // localCheckpoint materializes it ONCE (edge-list scale) instead of
    // planning the two degree joins three times — without it the degree-join
    // subtree is a third of kg_triangles' wall. Executor-memory blocks: a
    // lost executor mid-job fails the query (rerun recomputes) — acceptable
    // for a derived projection, same trade as Curation.lmScore.
    val oriented = withDeg.select(
      when(col("dsrc") < col("ddst") ||
          (col("dsrc") === col("ddst") && col("src") < col("dst")),
        struct(col("src").as("u"), col("dst").as("v"), col("ddst").as("dv")))
        .otherwise(struct(col("dst").as("u"), col("src").as("v"), col("dsrc").as("dv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint()
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.dv") < col("e2.dv") ||
            (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .join(oriented.as("e3"),
        col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    tri.select(col("a").as("id"))
      .unionAll(tri.select(col("b").as("id")))
      .unionAll(tri.select(col("c").as("id")))
      .groupBy(col("id").as("entity_id"))
      .agg(count(lit(1)).as("n_tri"))
  }

  /** Link prediction by common-neighbor count: non-adjacent pairs (src < dst)
   * sharing ≥ `minCommon` neighbors, the classic structural-completion signal
   * for a co-occurrence KG (entities that co-occur with the same third
   * entities but never directly are candidate missing edges / merge
   * candidates for the linker). Integer counts — exactly reproducible, so it
   * hash-oracles like the rest of the module.
   *
   * Plan: wedge self-join on the pivot endpoint → count per candidate pair →
   * anti-join against existing edges. Fan-out is Σ deg(pivot)² — unlike
   * [[triangles]], degree orientation cannot apply (common-neighbor counting
   * needs full neighborhoods), so the web-scale hub defense is
   * `maxPivotDegree`: keep only each pivot's strongest `maxPivotDegree`
   * edges (by weight desc, then neighbor id — deterministic) before the
   * wedge join, bounding the fan-out at |V|·cap². The cap is ON BY DEFAULT
   * (64 — the same per-doc entity bound Triples.cooccurEdges applies), the
   * engine's guards-default-on convention: on a co-occurrence graph one
   * stopword-like hub (degree 10⁶) alone would otherwise generate ~5·10¹¹
   * wedge rows. A capped run under-counts `common` for pairs mediated only
   * by super-hubs, which is usually the WANTED behavior — a pivot
   * co-occurring with everything carries no link signal, the same reasoning
   * TF-IDF applies to stopwords. Pass 0 for the exact unbounded mode (what
   * the exact `kg_linkpred` oracle checks); the capped path is oracled
   * separately (`kg_linkpred_capped` — the cap is a plain per-pivot
   * row_number window, expressible in SQL verbatim).
   * @param edges DataFrame(src, dst, w), src < dst, each pair once
   * @return DataFrame(src, dst, common), non-adjacent pairs only */
  def linkPredict(edges: DataFrame, minCommon: Long = 1L,
      maxPivotDegree: Int = 64): DataFrame = {
    val sym0 = symmetrize(edges)
    val capped = if (maxPivotDegree <= 0) sym0 else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a")).orderBy(col("w").desc, col("b"))
      sym0.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= maxPivotDegree).drop("__rn")
    }
    // both wedge legs read the (capped) symmetric projection; materialize it
    // once — same executor-block trade as triangles' oriented list
    val sym = capped.localCheckpoint()
    val n1 = sym.select(col("a").as("p"), col("b").as("x"))
    val n2 = sym.select(col("a").as("p"), col("b").as("y"))
    n1.join(n2, "p").filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
      .join(edges.select(col("src").as("x"), col("dst").as("y")),
        Seq("x", "y"), "left_anti")
      .select(col("x").as("src"), col("y").as("dst"), col("common"))
  }

  /** Both directions of an undirected edge list: (a, b, w) with each edge
   * twice. Union of two narrow projections — no shuffle by itself. */
  private def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src").as("a"), col("dst").as("b"), col("w"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b"), col("w")))
}
