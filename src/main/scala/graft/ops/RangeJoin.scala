package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed point-in-interval range join — all (point, interval) pairs
 * with `lo <= pt < hi` — via INTERVAL BUCKETING, the standard trick for the
 * join shape Spark plans as BroadcastNestedLoop/cartesian when written as a
 * θ-join: each interval is exploded into the fixed-width time buckets it
 * covers, each point maps to exactly ONE bucket, and the pair generation
 * becomes an EQUI-join on the bucket id followed by the exact containment
 * filter. A point's bucket meets each covering interval exactly once
 * (an interval's bucket list is distinct), so no post-join dedup is needed.
 *
 * Cost model: shuffle = |points| + Σ_i ceil(span_i / bucketWidth) rows, all
 * through one hash-partitioned equi-join — never the |P|×|I| of the nested
 * loop. `bucketWidth` trades explode factor against join selectivity; set it
 * near the median interval span (each interval then explodes into ~2 rows).
 * A degenerate interval (span ≫ bucketWidth) would silently explode, so
 * `maxBucketsPerInterval` fails LOUDLY instead — the guard style every
 * bounded collect in this codebase uses.
 *
 * Timestamps are bucketed on their epoch-second value (µs fraction kept —
 * `cast(ts as double)`); any numeric point/bound columns work unchanged.
 * Inner-join semantics: points in no interval and empty intervals drop out
 * (compose with a left anti/semi join for the other shapes).
 */
object RangeJoin {

  /**
   * @param points     DataFrame carrying `ptCol` (+ any payload columns)
   * @param intervals  DataFrame carrying `loCol`, `hiCol` (+ payload); half-open [lo, hi)
   * @param bucketWidth bucket width in the column's native units (seconds
   *                    for timestamps)
   * @param maxBucketsPerInterval loud-failure bound on the per-interval
   *                    explode factor (checked declaratively, per row)
   * @param preFilterPoints when true, first computes the intervals' global
   *                    [min lo, max hi) envelope (one scalar-aggregate job
   *                    over the interval side — interval-scale, not
   *                    point-scale) and drops points outside it BEFORE the
   *                    bucket join (guide §3.2's pre-filter-the-big-side
   *                    pattern, degenerate-Bloom form: one interval range
   *                    instead of a filter). Free-ish when points mostly
   *                    fall inside the envelope; a large win when the point
   *                    table's time range dwarfs the intervals'. Default off:
   *                    it costs one extra (small) Spark job per call, which
   *                    at probe-heavy call sites may exceed the saving —
   *                    callers that know their point range is wide opt in.
   * @return points.* ++ intervals.* for every containment pair
   */
  def pointInInterval(points: DataFrame, ptCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Double,
      maxBucketsPerInterval: Long = 10000L,
      preFilterPoints: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty,
      s"point/interval column collision: ${collisions.mkString(", ")} — rename before joining")
    Reserved.check("rangeJoin", points.columns ++ intervals.columns)

    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    // temporal columns bucket on their epoch-second value with the µs
    // fraction kept (a straight cast-to-double is not defined for
    // TIMESTAMP_NTZ); numerics bucket on their own value
    def asNum(df: DataFrame, c: String): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case TimestampType | TimestampNTZType | DateType =>
          unix_micros(col(c).cast("timestamp")).cast("double") / 1e6
        case _ => col(c).cast("double")
      }
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c / bucketWidth).cast("long")
    val loB = bucketOf(asNum(intervals, loCol))
    val hiB = bucketOf(asNum(intervals, hiCol))
    // the guard lives INSIDE the exploded expression — a separate dropped
    // check column would be pruned out of the plan and never fire. A null
    // bound explodes a null array (row DROPS — the documented inner-join
    // semantics for degenerate intervals) instead of falling through to the
    // raise_error arm via three-valued logic (round-4 advice).
    val guarded = intervals.withColumn("__bucket", explode(
      when(loB.isNull || hiB.isNull, lit(null).cast("array<bigint>"))
        .when(hiB - loB + lit(1L) <= maxBucketsPerInterval, sequence(loB, hiB))
        .otherwise(raise_error(concat(
          lit("rangeJoin: interval explodes into "),
          (hiB - loB + lit(1L)).cast("string"),
          lit(s" buckets (> $maxBucketsPerInterval) — widen bucketWidth " +
            s"($bucketWidth) or split the interval upstream"))))))
    // optional global-envelope pre-filter of the point side (see @param):
    // null bounds mean no well-formed interval exists — every interval row
    // drops at the explode anyway, so the unfiltered join is already empty
    // and the filter is skipped rather than special-cased
    val pts =
      if (!preFilterPoints) points
      else {
        val bounds = intervals
          .agg(min(asNum(intervals, loCol)).as("__lo"), max(asNum(intervals, hiCol)).as("__hi"))
          .head()
        if (bounds.isNullAt(0) || bounds.isNullAt(1)) points
        else points.filter(
          asNum(points, ptCol) >= bounds.getDouble(0) &&
            asNum(points, ptCol) < bounds.getDouble(1))
      }
    pts.withColumn("__bucket", bucketOf(asNum(pts, ptCol)))
      .join(guarded, Seq("__bucket"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bucket")
  }
}
