package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * JSONL corpus sources with the reference's malformed-line semantics
 * (SURVEY.md §1.3):
 *
 *  - mine/score/build inputs: PERMISSIVE — a malformed line is skipped with a
 *    warning counter, never fatal (phrasekit_mine.rs:132-138,
 *    phrasekit_score.rs:150-157); blank lines are skipped silently;
 *  - tag input: FAILFAST — one malformed line aborts the job
 *    (phrasekit_tag.rs:146's `?` on serde parse).
 *
 * The permissive counter rides the caller's first action via observe() — no
 * extra pass over the data. "Malformed" = unparseable JSON OR a required
 * field absent/null, matching serde's required-field rejection.
 */
object Jsonl {

  /** Permissive read: (parsed rows, malformed-line counter handle — read it
   * only after an action has consumed the DataFrame). */
  def readPermissive(spark: SparkSession, path: String, schema: StructType,
      requiredCols: Seq[String]): (DataFrame, () => Long) = {
    val obs = Observation()
    val bad = requiredCols
      .map(c => col("__parsed").getField(c).isNull)
      .foldLeft(col("__parsed").isNull)(_ || _)
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0) // blank lines: silent skip (ref: continue)
      .withColumn("__parsed", from_json(col("value"), schema))
      .withColumn("__bad", bad)
      .observe(obs,
        coalesce(sum(when(col("__bad"), 1L).otherwise(0L)), lit(0L)).as("malformed"),
        count(lit(1)).as("lines"))
      .filter(!col("__bad"))
      .select(col("__parsed.*"))
    (parsed, () => obs.get("malformed").asInstanceOf[Long])
  }

  /** Fail-fast read (tag semantics): any malformed line throws at action time.
   *
   * FAILFAST alone only aborts on unparseable/mistyped JSON; a WELL-FORMED
   * line missing a required field parses to a null column silently. The
   * reference tag CLI rejects that line too (serde's required-field rejection
   * surfacing through phrasekit_tag.rs:146's `?`), so required columns are
   * guarded with raise_error — the violation aborts the job at action time,
   * matching the CLI's abort-on-first-bad-line behavior. */
  def readStrict(spark: SparkSession, path: String, schema: StructType,
      requiredCols: Seq[String] = Nil): DataFrame = {
    val df = spark.read.schema(schema).option("mode", "FAILFAST").json(path)
    if (requiredCols.isEmpty) df
    else {
      // the guard is a FILTER, not a projection: a guarded projection column
      // would be silently PRUNED (guard included) whenever a caller selects
      // a subset of columns or runs a count — the filter survives any
      // downstream pruning because it determines the row set
      val guard = requiredCols.foldRight(lit(true)) { (n, rest) =>
        when(col(n).isNull, raise_error(
          lit(s"strict JSONL read: required field '$n' missing/null in $path")))
          .otherwise(rest)
      }
      df.filter(guard)
    }
  }
}
