package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of join — for every left row, the single most recent right row with
 * `right.ts <= left.ts` (or `<` when `inclusive = false`) within the same
 * key group; left rows with no prior right row keep nulls. The canonical
 * event-attribution / point-in-time-lookup operator (purchase → latest
 * preceding click; quote → last trade; feature snapshot at label time)
 * that Spark has no native join type for.
 *
 * Built as the MERGE formulation, not a range join: tag and union both
 * sides, then one window per key ordered by (ts, side, tie) carrying the
 * last non-null right payload forward — `last(ignoreNulls)` over rows
 * UNBOUNDED PRECEDING..CURRENT. Exactly ONE exchange (hashpartitioning on
 * the key) + one sort, shuffle volume = |L| + |R| rows. The naive
 * alternative — a θ-join on `r.ts <= l.ts` + max-per-left — plans a range
 * join whose worst case is |L|×|R| per key and collapses on Zipf keys; the
 * merge formulation's cost is sort-bound regardless of time skew, which is
 * what survives a 10^12-row event lake. Plan shape pinned in AsofJoinSpec.
 *
 * Semantics pinned in AsofJoinSpec (and vs DuckDB's native ASOF JOIN in
 * the driver oracle `q10_asof_attribution`):
 *  - inclusive: a right row AT the left row's timestamp matches
 *    (right sorts before left at equal ts); exclusive: it does not;
 *  - among multiple right rows at one matchable timestamp the LAST in
 *    `tieCols` order wins (deterministic; DuckDB's ASOF leaves the
 *    equal-ts winner unspecified, so the driver fixture is tie-free);
 *  - right columns come back nullable; left rows are never dropped.
 *
 * @param left      probe side; all its columns pass through
 * @param right     build side; `rightCols` are appended (nullable)
 * @param keyCols   equality keys present on both sides
 * @param tsCol     ordering column present on both sides
 * @param rightCols right columns to carry (must not collide with left's)
 * @param tieCols   deterministic order among equal-ts right rows (last wins)
 */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Seq[String], inclusive: Boolean = true,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs >= 1 equality key")
    require(rightCols.nonEmpty, "asof join needs >= 1 right column to carry")
    val collisions = rightCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right columns collide with left's: ${collisions.mkString(", ")} — rename before joining")
    Reserved.check("asof", left.columns ++ right.columns)

    val payloadType = StructType(right.select(rightCols.map(col): _*).schema.fields)
    val tieType = StructType(right.select(tieCols.map(col): _*).schema.fields)
    // side tag: right sorts before left at equal ts iff inclusive
    val (rightTag, leftTag) = if (inclusive) (0, 1) else (1, 0)

    val leftCols = left.columns.toSeq
    val lhs = left
      .withColumn("__side", lit(leftTag))
      .withColumn("__payload", lit(null).cast(payloadType))
      .withColumn("__tie",
        if (tieCols.isEmpty) lit(0) else lit(null).cast(tieType))
    val rhs = right.select(
      (keyCols :+ tsCol).distinct.map(col) ++ Seq(
        lit(rightTag).as("__side"),
        struct(rightCols.map(col): _*).as("__payload"),
        (if (tieCols.isEmpty) lit(0) else struct(tieCols.map(col): _*)).as("__tie")): _*)
    // align rhs to lhs's column set: left-only columns become typed nulls
    val rhsAligned = lhs.columns.foldLeft(rhs) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lhs.schema(c).dataType))
    }.select(lhs.columns.map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lhs.unionByName(rhsAligned)
      .withColumn("__match",
        last(when(col("__side") === rightTag, col("__payload")),
          ignoreNulls = true).over(w))
      .filter(col("__side") === leftTag)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
