package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-defusing helpers (SURVEY.md §7.6 item 2; north rule: "partitioning /
 * shuffle / skew handled explicitly").
 *
 * At 10^12 docs the head of the key distribution ("for the"-class n-grams,
 * head domains) concentrates on single reducers. For COUNT-like aggregation
 * Spark's partial aggregation already combines per map task, but for aggregates
 * with large per-key state (collect_list, distinct) and for writes partitioned
 * by a skewed key, explicit salting is required.
 */
object Salt {

  /** Two-phase salted count: groupBy (key, salt) partial counts → groupBy key
   * final sum. Equivalent to groupBy(key).count() but bounds any single
   * reducer's share of a hot key to 1/buckets. The salt is a DETERMINISTIC
   * hash of the whole row — monotonically_increasing_id() upstream of a
   * shuffle changes row→bucket assignment on task retry after a fetch
   * failure (indeterminate-stage correctness hazard).
   *
   * LIMITATION: when a hot key's rows are IDENTICAL across every column (e.g.
   * `df` is just the key column), all duplicates hash to one salt bucket and
   * the skew protection is a no-op. Keep at least one varying column in `df`
   * (doc id, position, partition column) when salting a counting input; the
   * deterministic alternative — a per-partition row index — would itself be
   * retry-unstable upstream of a shuffle, which is exactly the hazard this
   * helper exists to avoid. (Spark's own partial aggregation already combines
   * identical rows map-side, so the duplicate-row case is also the case where
   * the pre-shuffle combiner has ALREADY collapsed the hot key to one row per
   * map task — the residual skew is #mapTasks rows, not #rows.) */
  def saltedCount(df: DataFrame, keyCol: Column, buckets: Int): DataFrame = {
    val rowHash = xxhash64(df.columns.map(col).toIndexedSeq: _*)
    val salted = df
      .withColumn("__salt", pmod(xxhash64(keyCol, rowHash), lit(buckets)))
      .groupBy(keyCol.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
    salted.groupBy(col("key")).agg(sum(col("__partial")).as("count"))
  }

  /** Repartition by (key, salt-of-rest) so one hot key spreads over `buckets`
   * partitions instead of one — used before writing triples partitioned by a
   * Zipf-headed subject. Pass explicit `spreadCols` that vary within a hot key
   * (obj, url, position, …); the all-columns fallback degrades to one bucket
   * per distinct row, which for fully-duplicated rows is no spread at all —
   * see the saltedCount limitation note. */
  def repartitionSalted(df: DataFrame, numPartitions: Int, keyCol: Column,
      buckets: Int, spreadCols: Column*): DataFrame = {
    val spread = if (spreadCols.nonEmpty) xxhash64(spreadCols: _*)
                 else xxhash64(df.columns.map(col).toIndexedSeq: _*) // deterministic row hash

    df.withColumn("__salt", pmod(spread, lit(buckets.toLong)))
      .repartition(numPartitions, keyCol, col("__salt"))
      .drop("__salt")
  }
}
