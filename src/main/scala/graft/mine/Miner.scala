package graft.mine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * N-gram mining (SURVEY.md G1 + A1 + P1 + P3 + O1) — the Spark re-expression of
 * the reference's mine stage (ext/phrasekit/src/bin/phrasekit_mine.rs:109-199):
 * for each doc, every contiguous window of length n in [minN, maxN] (overlapping;
 * one count per OCCURRENCE, not per doc), lowercased, counted globally, filtered
 * by min_count, sorted by count desc.
 *
 * The generator is a pure higher-order-function column expression (sequence +
 * transform + slice + flatten + explode) — fully inside whole-stage codegen, no
 * UDF and no typed flatMap. The global count is `groupBy(ngram).count()`: Spark's
 * partial (map-side) + final hash aggregation is the distributed version of the
 * reference's single HashMap, and partial aggregation already defuses hot-key
 * skew for counting ("for the"-class grams combine within every map task before
 * the shuffle).
 *
 * The n-gram shuffle key is the space-joined STRING (tokens never contain
 * whitespace after whitespace tokenization) — cheaper to hash/compare at the
 * exchange than ARRAY<STRING>; the array form is re-derived by `split` on output.
 *
 * Output ordering adds an `ngram` ascending tie-break to the reference's
 * count-desc sort, turning its HashMap-iteration tie nondeterminism
 * (phrasekit_mine.rs:181-187) into a total order (SURVEY.md §7.6 item 1).
 */
object Miner {

  final case class MineConfig(minN: Int = 2, maxN: Int = 5, minCount: Long = 10,
      ordered: Boolean = true) {
    // config sanity mirrors phrasekit_mine.rs:78-80
    require(minN >= 1 && minN <= maxN && maxN <= 10,
      s"invalid n-gram bounds: min_n=$minN max_n=$maxN (need 1 <= min_n <= max_n <= 10)")
  }

  /** Column expression: ARRAY<STRING> tokens → ARRAY<STRING> of space-joined
   * n-grams for all n in [minN, maxN], lowercased. */
  def ngramsCol(tokens: Column, minN: Int, maxN: Int): Column = {
    val lowered = transform(tokens, t => lower(t))
    flatten(
      transform(sequence(lit(minN), lit(maxN)), n =>
        when(size(lowered) >= n,
          transform(sequence(lit(0), size(lowered) - n),
            i => array_join(slice(lowered, i + 1, n), " ")))
          .otherwise(array())))
  }

  /**
   * Mine n-grams from a corpus.
   * @param docs any DataFrame with an ARRAY<STRING> column `tokensCol`
   * @return DataFrame(ngram STRING, tokens ARRAY<STRING>, count BIGINT)
   */
  def mine(docs: DataFrame, tokensCol: String, cfg: MineConfig = MineConfig()): DataFrame = {
    val counted = docs
      .select(explode(ngramsCol(col(tokensCol), cfg.minN, cfg.maxN)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("count"))
      .filter(col("count") >= cfg.minCount)
      .withColumn("tokens", split(col("ngram"), " "))
      .select("ngram", "tokens", "count")
    if (cfg.ordered) counted.orderBy(col("count").desc, col("ngram").asc) else counted
  }

  /** Mining stats (SURVEY.md A3), one aggregate pass. */
  def stats(docs: DataFrame, tokensCol: String, mined: DataFrame,
      cfg: MineConfig): MiningStats = {
    val row = docs.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(size(col(tokensCol))), lit(0L)).as("n_tokens"),
      coalesce(sum(size(ngramsCol(col(tokensCol), cfg.minN, cfg.maxN))), lit(0L))
        .as("n_extracted")).head()
    MiningStats(row.getLong(0), row.getLong(1), row.getLong(2), mined.count())
  }

  final case class MiningStats(totalDocs: Long, totalTokens: Long,
      totalNgramsExtracted: Long, ngramsAfterFilter: Long)
}
