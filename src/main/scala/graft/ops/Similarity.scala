package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions

/**
 * Approximate-nearest-neighbor search over an embedding column (ARRAY<FLOAT>).
 *
 * Two paths:
 *  - `bruteForceTopK`: exact cosine top-k via a broadcast of the query set and
 *    a window per query — the baseline, O(|queries| × |corpus|).
 *  - `ivfTopK`: IVF (inverted-file) ANN — the scale path. Centroids are
 *    seeded deterministically from the corpus (hash-ranked sample) and refined
 *    with a fixed number of Lloyd iterations (groupBy-mean over centroid-scale
 *    rows — one shuffle per iteration, never of the corpus); vectors are
 *    assigned to their nearest centroid by a narrow mapPartitions argmax over
 *    the broadcast centroid matrix (zero corpus exchanges, plan-pinned); at
 *    query time only the `nProbe` nearest cells per query are scanned. Recall
 *    measured against the exact baseline in SimilaritySpec.
 *
 * All vector math goes through `graft_vdot`, a native codegen Catalyst
 * expression (graft.plans.VectorDot) — zip_with/aggregate lambdas evaluate
 * INTERPRETED per element and were the round-1 bench's top cost.
 */
object Similarity {

  /** Make graft_vdot resolvable on the session owning the current plan. */
  private def ensureFunctions(): Unit =
    SparkSession.getActiveSession.foreach(GraftFunctions.register)

  /** cosine(a, b) for ARRAY<FLOAT>/ARRAY<DOUBLE> columns, computed in double
   * via the codegen dot-product expression. */
  def cosine(a: Column, b: Column): Column = {
    ensureFunctions()
    def dot(x: Column, y: Column) = call_function("graft_vdot", x, y)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /**
   * Exact top-k neighbors for each query vector.
   * @param corpus  (idCol, vecCol)
   * @param queries (idCol, vecCol) — small enough to broadcast
   * @return (query_id, neighbor_id, cos, rank)
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /**
   * Exact near-duplicate pairs within blocks: all (a, b) with a < b in the
   * same `blockCol` group and cosine >= `threshold`, as
   * (a BIGINT, b BIGINT, cos DOUBLE).
   *
   * Shape: ONE shuffle (groupByKey on the block), then per-block pairwise dot
   * products over PRIMITIVE double arrays inside flatMapGroups — no interpreted
   * per-element lambdas. Pairs are pruned EXACTLY with a Cauchy-Schwarz prefix
   * bound: dot = head + tail where |tail| <= |a_tail||b_tail|, so a pair whose
   * head(prefixDims) + tailNorm(a)·tailNorm(b) < threshold·|a||b| can be
   * skipped without computing the remaining dimensions — no approximation, the
   * output is bit-identical to the unpruned double math (ascending-index
   * accumulation, cos = dot/(|a||b|), matching the DuckDB oracle).
   *
   * Contract: one block must fit in one task's memory (near-dup blocking keys
   * are designed for that — label buckets, LSH bands). Blocks are still
   * O(block²) pairs by definition of exact verification; for unblocked
   * corpus-scale near-dup, generate candidates with the IVF/LSH paths first.
   */
  def blockedCosinePairs(df: DataFrame, blockCol: String, idCol: String,
      vecCol: String, threshold: Double, prefixDims: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(blockCol).cast("string").as("blk"),
        col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("vec"))
      .as[(String, Long, Array[Double])]
    rows.groupByKey(_._1).flatMapGroups { (_, it) =>
      val items = it.toArray.sortInPlaceBy(_._2)
      val n = items.length
      val ids = new Array[Long](n)
      val vecs = new Array[Array[Double]](n)
      val norm = new Array[Double](n)
      val tailNorm = new Array[Double](n)
      var i = 0
      while (i < n) {
        ids(i) = items(i)._2
        val v = items(i)._3
        vecs(i) = v
        val p = math.min(prefixDims, v.length)
        var s = 0.0; var st = 0.0; var d = 0
        while (d < v.length) { val x = v(d) * v(d); s += x; if (d >= p) st += x; d += 1 }
        norm(i) = math.sqrt(s)
        tailNorm(i) = math.sqrt(st)
        i += 1
      }
      val out = Vector.newBuilder[(Long, Long, Double)]
      i = 0
      while (i < n) {
        val vi = vecs(i)
        var j = i + 1
        while (j < n) {
          val vj = vecs(j)
          if (vi.length == vj.length && norm(i) > 0.0 && norm(j) > 0.0) {
            val p = math.min(prefixDims, vi.length)
            var head = 0.0; var d = 0
            while (d < p) { head += vi(d) * vj(d); d += 1 }
            val denom = norm(i) * norm(j)
            // exact upper bound on the full dot: skip iff even the bound misses
            if (head + tailNorm(i) * tailNorm(j) >= threshold * denom) {
              var dot = head
              while (d < vi.length) { dot += vi(d) * vj(d); d += 1 }
              val cos = dot / denom
              if (cos >= threshold) out += ((ids(i), ids(j), cos))
            }
          }
          j += 1
        }
        i += 1
      }
      out.result()
    }.toDF("a", "b", "cos")
  }

  /**
   * Corpus-scale embedding near-dup WITHOUT a blocking column: IVF cells as
   * the blocks, with MULTI-ASSIGNMENT — each vector joins its `nAssign`
   * nearest cells (the multi-probe trick on the index side), and exact
   * pairwise verification runs per cell via blockedCosinePairs. A pair is
   * found iff the two vectors share at least one of their top-nAssign cells;
   * duplicates from multiply-shared cells collapse via distinct() (the cos is
   * bit-identical per pair — same vectors, same ascending accumulation).
   * Recall-vs-exact is pinned in SimilarityPlansSpec; cost scales ×nAssign.
   * Cell sizing at scale: nCells ∝ √N keeps per-cell lists task-sized (the
   * blockedCosinePairs contract).
   */
  def ivfCosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, cfg: IvfConfig = IvfConfig(), nAssign: Int = 2): DataFrame = {
    // reuse the SAME checkpointed projection the centroid training scanned —
    // rebuilding it from `corpus` would re-run the source scan+cast while the
    // materialized copy sits unused
    val base = projectVecs(corpus, idCol, vecCol).localCheckpoint()
    val centroids = trainCentroids(base, cfg)
    blockedCosinePairs(assign(base, centroids, nAssign), "cell", "id", "vec", threshold)
      .distinct()
  }

  final case class IvfConfig(nCells: Int = 16, lloydIter: Int = 3, nProbe: Int = 4)

  /** (id, vec ARRAY<DOUBLE>) projection of an embedding table. */
  private def projectVecs(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("vec"))

  /** Deterministic IVF index: (cells DF (cell, centroid ARRAY<DOUBLE>),
   * assigned corpus DF (id, vec, cell)). */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      cfg: IvfConfig = IvfConfig()): (DataFrame, DataFrame) = {
    // materialize the projected vector table once: it is scanned lloydIter+1
    // times (each Lloyd assign + the final assignment) — localCheckpoint blocks
    // are freed by the ContextCleaner when the index is GC'd
    val base = projectVecs(corpus, idCol, vecCol).localCheckpoint()
    val centroids = trainCentroids(base, cfg)
    (centroids, assign(base, centroids))
  }

  /** Seed + Lloyd-refine centroids over a materialized (id, vec) table.
   * Deterministic seeds: the nCells vectors with the smallest xxhash64(id) —
   * a seeded uniform sample, no Math.random. */
  private def trainCentroids(base: DataFrame, cfg: IvfConfig): DataFrame = {
    var centroids = base
      .withColumn("__r", xxhash64(col("id")))
      .orderBy("__r").limit(cfg.nCells)
      .withColumn("cell", row_number().over(Window.orderBy(col("__r"))) - 1)
      .select(col("cell"), col("vec").as("centroid"))

    // Lloyd refinement: assign to nearest centroid (broadcast), mean per cell.
    // element-wise mean via posexplode + groupBy (cell, pos) — one shuffle.
    for (_ <- 1 to cfg.lloydIter) {
      val assigned = assign(base, centroids)
      // localCheckpoint per iteration: the centroid table is tiny, and without
      // it the loop's lineage compounds — every later iteration (and the final
      // assign) would re-execute all previous Lloyd rounds from scratch
      centroids = assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
        .localCheckpoint()
    }
    centroids
  }

  /** Assign each vector to its `maxRank` nearest centroids (max cosine;
   * deterministic cell-id tie-break, NaN ranked first to mirror Spark's
   * NaN-greatest descending sort) — the centroid MATRIX (nCells × dims
   * doubles, tiny by construction) is collected and broadcast, and the
   * per-row arg-top-maxRank is computed NARROWLY in one mapPartitions pass.
   * ZERO exchanges of the corpus: the round-3 crossJoin+window formulation
   * planned an Exchange hashpartitioning(id) of N×nCells full-vector rows
   * per Lloyd iteration, which at 10⁹ vectors is the dominant cost of the
   * whole index build (round-3 verdict #1); the plan shape is pinned in
   * SimilarityPlansSpec. maxRank = 1 is index assignment; > 1 is the
   * multi-assign near-dup blocking. */
  private def assign(base: DataFrame, centroids: DataFrame, maxRank: Int = 1): DataFrame = {
    val spark = base.sparkSession
    val cents: Array[(Int, Array[Double], Double)] = centroids
      .select(col("cell").cast("int"), col("centroid"))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        (r.getInt(0), v, math.sqrt(s))
      }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(cents)
    val k = math.min(maxRank, cents.length)
    val vecIdx = base.schema.fieldIndex("vec")
    val outSchema = org.apache.spark.sql.types.StructType(base.schema.fields :+
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    // (cos desc with NaN first — java.lang.Double.compare treats NaN as
    // largest, matching Spark's desc ordering — then cell asc)
    val ord = new Ordering[(Int, Double)] {
      def compare(a: (Int, Double), b: (Int, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2)
        if (c != 0) c else Integer.compare(a._1, b._1)
      }
    }
    base.mapPartitions { rows =>
      val cs = bc.value
      rows.flatMap { row =>
        val v = row.getSeq[Double](vecIdx).toArray
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        val nv = math.sqrt(s)
        val scored = cs.map { case (cell, cv, nc) =>
          var d = 0.0; var j = 0
          val n = math.min(v.length, cv.length)
          while (j < n) { d += v(j) * cv(j); j += 1 }
          (cell, d / (nv * nc))
        }
        scored.sorted(ord).iterator.take(k).map(t =>
          org.apache.spark.sql.Row.fromSeq(row.toSeq :+ t._1))
      }
    }
  }

  /**
   * IVF ANN query: scan only the nProbe nearest cells per query.
   * @return (query_id, neighbor_id, cos, rank) — rank within scanned cells
   */
  def ivfTopK(index: (DataFrame, DataFrame), queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cfg: IvfConfig = IvfConfig()): DataFrame = {
    val (centroids, assigned) = index
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("__qv"))
    // probe cells per query (queries × centroids is tiny)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__cos", cosine(col("__qv"), col("centroid")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("cell"))))
      .filter(col("__rk") <= cfg.nProbe)
      .select(col("query_id"), col("__qv"), col("cell"))
    assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", cosine(col("__qv"), col("vec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cos"), col("rank"))
  }
}
