package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components over a DataFrame edge list — iterative min-label
 * propagation with pointer jumping, checkpointed per iteration (SURVEY.md §7.5;
 * GraphX is RDD-based and therefore out).
 *
 * Each iteration: (1) every vertex takes the min label over itself and its
 * neighbors (one shuffle: groupBy min — partial aggregation combines map-side);
 * (2) pointer jumping: label := label(label) via a self-join on the (small)
 * label table, which squares the propagation distance per round, giving
 * O(log d) convergence like small-star. `localCheckpoint` truncates lineage
 * each round so plans don't grow and self-join attribute lineage stays sane.
 * Deterministic: min is order-independent.
 */
object ConnectedComponents {

  /** Plain array-based union-find with path halving; roots normalized to the
   * minimum vertex id on output. */
  private final class UnionFind {
    private val parent = new scala.collection.mutable.LongMap[Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) {
        val gp = parent.getOrElse(p, p)
        parent(x) = gp
        x = p
        p = gp
      }
      x
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        // attach larger root under smaller → roots are component minima
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    def touch(x: Long): Unit = if (!parent.contains(x)) parent(x) = x
    /** (vertex, root) for every seen vertex; keys snapshotted because find()'s
     * path-halving mutates the map. */
    def entries: Iterator[(Long, Long)] = {
      val ks = parent.keys.toArray
      ks.iterator.map(k => (k, find(k)))
    }
  }

  /** Forest-pair count above which the single-task merge would be too large
   * and the iterative label-propagation path runs instead. */
  val ContractionLimit: Long = 50000000L

  /**
   * @param edges DataFrame(src BIGINT, dst BIGINT) — undirected (orientation ignored)
   * @return DataFrame(id BIGINT, component BIGINT) where component = min vertex id
   *         of the component; every vertex appearing in edges is present.
   *
   * Two-level contraction (the GraphFrames/production pattern): each partition
   * runs union-find over its edges and emits one (vertex → local root) star
   * edge per vertex — replacing a partition's edges by its spanning stars
   * preserves global connectivity — then a single task union-finds the star
   * union (≤ one pair per vertex-occurrence: tens of MB even at 10^8-node
   * phrase graphs). ONE shuffle end-to-end, vs 3-4 exchanges × O(log d)
   * iterations for label propagation — measured 10.4 s → ~1 s on a 296k-edge
   * phrase graph. Graphs whose star union exceeds ContractionLimit fall back
   * to the iterative path (runIterative).
   */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.selectExpr("cast(src as long) as a", "cast(dst as long) as b").as[(Long, Long)]
    // localCheckpoint materializes the per-partition forests ONCE: without it
    // the sizing count() and the coalesce(1) merge would each re-run the full
    // edge scan + union-find (blocks are reclaimed by the ContextCleaner when
    // the dataset is GC'd)
    val stars = e.mapPartitions { it =>
      val uf = new UnionFind
      it.foreach { case (a, b) => uf.touch(a); uf.touch(b); uf.union(a, b) }
      uf.entries
    }.localCheckpoint()
    // small by construction (≤ one pair per vertex per partition)
    val nStars = stars.count()
    if (nStars <= ContractionLimit) {
      val merged = stars.coalesce(1).mapPartitions { it =>
        val uf = new UnionFind
        it.foreach { case (a, b) => uf.union(a, b); uf.touch(a); uf.touch(b) }
        uf.entries
      }
      merged.toDF("id", "component").repartition(col("id"))
    } else {
      runIterative(edges, maxIter)
    }
  }

  /** Iterative min-label propagation with pointer jumping — the path for
   * graphs too large for the single-task merge. */
  def runIterative(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.selectExpr("cast(src as long) as a", "cast(dst as long) as b")
    val sym = e.unionByName(e.selectExpr("b as a", "a as b")).localCheckpoint()

    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val msgs = sym
        .join(labels.select(col("id").as("b"), col("component")), "b")
        .select(col("a").as("id"), col("component"))
      // min over self + neighbors; the self-join below reuses this exchange
      // (identical subplan → ReusedExchange), so no materialization needed here
      val nbrMin = msgs.unionByName(labels.select("id", "component"))
        .groupBy("id").agg(min("component").as("component"))
      // pointer jumping: component := component(component)
      val lookup = nbrMin.select(col("id").as("__k"), col("component").as("__v"))
      val jumped = nbrMin
        .join(lookup, nbrMin("component") === lookup("__k"), "left")
        .select(nbrMin("id").as("id"),
          coalesce(col("__v"), nbrMin("component")).as("component"))
        .localCheckpoint(false) // lazy: materializes with the convergence check
      val changed = jumped
        .join(labels.select(col("id"), col("component").as("__old")), "id")
        .filter(col("component") =!= col("__old"))
        .limit(1).count()
      labels = jumped
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
