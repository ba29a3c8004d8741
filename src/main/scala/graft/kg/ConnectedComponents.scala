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

  /**
   * @param edges DataFrame(src BIGINT, dst BIGINT) — undirected (orientation ignored)
   * @return DataFrame(id BIGINT, component BIGINT) where component = min vertex id
   *         of the component; every vertex appearing in edges is present.
   */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
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
      val nbrMin = msgs.unionByName(labels.select("id", "component"))
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(false) // lazy: materializes with the convergence check
      // pointer jumping: component := component(component)
      val lookup = nbrMin.select(col("id").as("__k"), col("component").as("__v"))
      val jumped = nbrMin
        .join(lookup, nbrMin("component") === lookup("__k"), "left")
        .select(nbrMin("id").as("id"),
          coalesce(col("__v"), nbrMin("component")).as("component"))
        .localCheckpoint(false)
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
