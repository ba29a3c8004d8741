package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic global sequential-ID assignment (SURVEY.md O3/O4) that scales:
 * a single-partition `Window.orderBy` would funnel every row through one task, so
 * we range-partition on the order columns, number rows within each partition, and
 * add cumulative per-partition offsets (the offsets table is tiny and broadcast).
 *
 * `orderCols` must define a TOTAL order — ids are then a pure function of the
 * data, independent of partitioning (determinism contract, SURVEY.md §7.7).
 * The reference assigns ids by `starting_phrase_id + index` after an in-memory
 * sort (phrasekit_score.rs:263-267); ours is the distributed equivalent.
 */
object Ids {

  def assignSequential(df: DataFrame, orderCols: Seq[Column], startId: Long,
      idCol: String): DataFrame = {
    val pidCol = "__graft_pid"
    val rnCol = "__graft_rn"
    val offCol = "__graft_off"
    // materialize the INPUT once: repartitionByRange SAMPLES its child for
    // range boundaries — a second full pass that would double-count any
    // upstream observe() metrics (and recompute expensive lineage)
    val src = df.localCheckpoint()
    // localCheckpoint (not persist) so the two consumers below see identical
    // (sampled) range boundaries AND the blocks are reclaimed automatically
    // when the dataset is GC'd — a bare persist() here leaked cache across
    // queries for the lifetime of the session
    val parted = src
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn(pidCol, spark_partition_id())
      .localCheckpoint()
    val w = Window.partitionBy(col(pidCol)).orderBy(orderCols: _*)
    val withRn = parted.withColumn(rnCol, row_number().over(w))
    val offsets = parted.groupBy(col(pidCol)).agg(count(lit(1)).as("__cnt"))
      .withColumn(offCol,
        coalesce(
          sum(col("__cnt")).over(
            Window.orderBy(col(pidCol)).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(pidCol), col(offCol))
    val out = withRn
      .join(broadcast(offsets), pidCol)
      .withColumn(idCol, lit(startId) + col(offCol) + col(rnCol).cast("long") - 1L)
      .drop(pidCol, rnCol, offCol)
    out
  }
}
