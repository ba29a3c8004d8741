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
   * failure (indeterminate-stage correctness hazard). */
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
   * Zipf-headed subject. */
  def repartitionSalted(df: DataFrame, numPartitions: Int, keyCol: Column,
      buckets: Int, spreadCols: Column*): DataFrame = {
    val spread = if (spreadCols.nonEmpty) xxhash64(spreadCols: _*)
                 else xxhash64(df.columns.map(col).toIndexedSeq: _*) // deterministic row hash

    df.withColumn("__salt", pmod(spread, lit(buckets.toLong)))
      .repartition(numPartitions, keyCol, col("__salt"))
      .drop("__salt")
  }
}
