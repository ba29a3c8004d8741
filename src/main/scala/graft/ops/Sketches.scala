package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Mergeable distinct-count sketches for incremental corpus statistics —
 * the dataset-card numbers (distinct texts / urls / hosts per source) that a
 * 10^12-document lake cannot afford to recompute by rescanning every epoch.
 *
 * Built on Spark's native DataSketches HLL aggregates (`hll_sketch_agg` /
 * `hll_union_agg` / `hll_sketch_estimate` — codegen'd built-ins, not UDFs):
 * each epoch's delta is folded into a per-key BINARY sketch column at
 * delta-scale cost, sketches are committed next to the epoch's count layers
 * (a sketch row is O(2^lgK) ≈ KB-scale — metadata, not data), and the
 * corpus-lifetime distinct count for any key is the union of its epoch
 * sketches — no corpus rescan, ever. This mirrors [[graft.kg.Incremental]]'s
 * additive-count design: counts merge by SUM, distincts merge by HLL union.
 *
 * Exactness posture: estimates, not counts — the relative error is the
 * standard HLL bound (~1.04/√2^lgK ≈ 1.6 % at the default lgK = 12), pinned
 * against the exact twin in SketchesSpec. The ESTIMATE is a function of the
 * input multiset alone (HLL registers are per-slot maxima — merge-order
 * insensitive), pinned across repartitionings; serialized sketch BYTES may
 * differ across merge orders (sparse-mode internals), so retries overwrite a
 * sketch row value-equivalently, not byte-identically — unlike the count
 * layers, which stay byte-reproducible.
 * These are deliberately NOT driver-oracle queries: DuckDB's
 * approx_count_distinct is a different HLL implementation, so the spec pins
 * estimate-vs-exact and merge-vs-direct instead.
 */
object Sketches {

  /** Per-key HLL sketch of `valueCol` plus the row count: one partial-agg
   * shuffle (sketches merge map-side like any other declarative aggregate).
   * @param lgK log2 of the sketch's register count — 2^lgK bytes-scale state
   *            per key, ~1.04/√2^lgK relative standard error */
  def distinctSketch(df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(keys.nonEmpty, "distinctSketch needs ≥ 1 grouping key")
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"),
        count(col(valueCol)).as("rows"))
  }

  /** Union per-key sketches across epoch layers (the read side of the
   * incremental layout): rows from any number of `distinctSketch` outputs,
   * one aggregation shuffle over sketch-scale rows. `allowDifferentLgK`
   * stays false — mixing precisions silently downgrades to the coarsest. */
  def mergeDistinct(parts: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeDistinct needs ≥ 1 grouping key")
    parts.groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"),
        sum(col("rows")).as("rows"))
  }

  /** Materialize the estimate column; the sketch stays alongside so the row
   * remains mergeable into later epochs. */
  def withEstimate(df: DataFrame, as: String = "distinct_est"): DataFrame =
    df.withColumn(as, hll_sketch_estimate(col("sketch")))
}
