package graft.mine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Phrase-quality filters beyond raw counts (north star: "n-gram count
 * aggregation plus PMI and left/right branching-entropy filters,
 * AutoPhrase-style"). Not present in the reference (additive, config-gated off
 * for reference parity; see Liu et al., "Mining Quality Phrases from Massive
 * Text Corpora" / AutoPhrase for the published technique).
 *
 * Definitions (deterministic, documented here because variants abound):
 *  - PMI(g = w1..wn) = log2( c(g) · T^(n-1) / Π c(wi) ), T = total token count —
 *    multiword pointwise mutual information with all probabilities normalized
 *    by T. High PMI ⇒ the words co-occur far above independence.
 *  - Right branching entropy H_r(g) = entropy of the next-token distribution
 *    after g, from the (n+1)-gram table: H = ln(S) − Σ c·ln(c) / S over the
 *    extension counts. Left entropy symmetric. Low entropy ⇒ g is a fragment of
 *    a longer fixed phrase; high both-sides entropy ⇒ g is a free-standing unit.
 *    Candidates with NO observed extension on a side (corpus edge) get entropy 0
 *    on that side — they only pass if the other side clears the bar, matching
 *    the conservative AutoPhrase reading.
 *
 * All computation is groupBy/join over the gram tables — two shuffles per side,
 * partial-agg combined, no UDFs.
 */
object Entropy {

  final case class EntropyConfig(
      minPmi: Double = 1.0,
      minBranchEntropy: Double = 0.5)

  /** per-group entropy from (key, count) pairs: H = ln(S) - Σ c ln c / S. */
  private def entropyAgg(count: Column): Column = {
    val s = sum(count.cast("double"))
    (log(s) - sum(count.cast("double") * log(count.cast("double"))) / s)
  }

  /**
   * Score candidates with PMI and left/right branching entropy.
   *
   * @param candidates (ngram STRING, count BIGINT), n-grams of length in [minN, maxN]
   * @param unigrams   (ngram STRING, count BIGINT) single-token counts (min_count 1)
   * @param extensions (ngram STRING, count BIGINT) n-grams of length [minN+1, maxN+1]
   *                   (min_count 1) — supplies both-side context distributions
   * @return candidates + (pmi DOUBLE, left_entropy DOUBLE, right_entropy DOUBLE)
   */
  def score(candidates: DataFrame, unigrams: DataFrame, extensions: DataFrame): DataFrame = {
    val totalTokens = unigrams.agg(coalesce(sum("count"), lit(0L))).head().getLong(0)

    // PMI: explode candidate tokens, join unigram counts, aggregate Σ ln c(wi)
    val cand = candidates.select(col("ngram"), col("count").cast("long").as("count"),
      split(col("ngram"), " ").as("toks"))
    val pmi = cand
      .select(col("ngram"), col("count"), size(col("toks")).as("n"),
        explode(col("toks")).as("tok"))
      .join(unigrams.select(col("ngram").as("tok"), col("count").as("uc")), Seq("tok"))
      .groupBy("ngram", "count", "n")
      .agg(sum(log(col("uc").cast("double"))).as("sum_ln_uc"),
        count(lit(1)).as("joined"))
      // log2(c(g) T^(n-1) / Π c(wi)) = (ln c(g) + (n-1) ln T − Σ ln c(wi)) / ln 2
      .withColumn("pmi",
        (log(col("count").cast("double")) +
          (col("n") - 1).cast("double") * math.log(totalTokens.toDouble) -
          col("sum_ln_uc")) / math.log(2.0))
      .select("ngram", "pmi")

    // branching entropies from the (n+1)-gram table
    val ext = extensions.select(split(col("ngram"), " ").as("toks"),
      col("count").cast("long").as("c"))
    val right = ext
      .select(array_join(slice(col("toks"), lit(1), size(col("toks")) - 1), " ").as("ngram"),
        element_at(col("toks"), -1).as("next"), col("c"))
      .groupBy("ngram").agg(entropyAgg(col("c")).as("right_entropy"))
    val left = ext
      .select(array_join(slice(col("toks"), lit(2), size(col("toks")) - 1), " ").as("ngram"),
        element_at(col("toks"), 1).as("prev"), col("c"))
      .groupBy("ngram").agg(entropyAgg(col("c")).as("left_entropy"))

    candidates
      .join(pmi, Seq("ngram"), "left")
      .join(left, Seq("ngram"), "left")
      .join(right, Seq("ngram"), "left")
      .na.fill(0.0, Seq("left_entropy", "right_entropy"))
      .na.fill(Double.NegativeInfinity, Seq("pmi"))
  }

  /** Convenience: filter mined candidates over a tokenized corpus. */
  def filterCandidates(docs: DataFrame, tokensCol: String, candidates: DataFrame,
      minN: Int, maxN: Int, cfg: EntropyConfig = EntropyConfig()): DataFrame = {
    val unigrams = Miner.mine(docs, tokensCol, Miner.MineConfig(1, 1, 1, ordered = false))
      .select("ngram", "count")
    val extensions = Miner.mine(docs, tokensCol,
      Miner.MineConfig(minN + 1, maxN + 1, 1, ordered = false)).select("ngram", "count")
    score(candidates, unigrams, extensions)
      .filter(col("pmi") >= cfg.minPmi &&
        greatest(col("left_entropy"), col("right_entropy")) >= cfg.minBranchEntropy)
  }
}
