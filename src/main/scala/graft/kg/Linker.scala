package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Entity blocking via MinHash-LSH over phrase token sets (SURVEY.md §7.5).
 *
 * Not in the reference (which stops at spans); defined here deterministically so
 * triple P/R is stable. Hand-rolled with Catalyst built-ins (`xxhash64` + `min`
 * per seed, band-key groupBy) instead of Spark ML's Vector-typed MinHashLSH:
 * every step is a plain DataFrame op, codegen'd, and shuffle-explicit.
 *
 * Shape: explode token sets → k seeded hashes per token → min per (id, seed)
 * (partial agg combines map-side) → b band keys per id → self-join on band key
 * for candidate pairs → exact Jaccard verify via array_intersect/array_union.
 * The only shuffles are the signature agg and the band join; both key on
 * uniformly-distributed hashes, so no salting is needed here.
 */
object Linker {

  /**
   * Defaults tuned for ENTITY CANONICALIZATION of short phrases: threshold 0.8
   * merges only same-token-set permutations and (n)/(n+1)-subset variants of
   * 4+-token phrases. A loose threshold (0.5) on 2-3-token phrases links every
   * "x y"↔"x y z" pair — measured 1.8M edges over 44k phrases, collapsing the
   * entity space into mega-components and making the exact-verify join the
   * pipeline bottleneck. Two 8-row bands keep P(candidate | j=0.5) ≈ 0.8%
   * while P(candidate | j≥0.9) ≈ 74% per band.
   */
  final case class LinkConfig(
      numHashes: Int = 16,
      bands: Int = 2, // rows per band = numHashes / bands
      jaccardThreshold: Double = 0.8,
      maxBucketSize: Int = 1000) {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
  }

  /**
   * @param phrases DataFrame(phrase_id, tokens ARRAY<STRING>)
   * @return edges DataFrame(src BIGINT, dst BIGINT, jaccard DOUBLE) with src < dst
   */
  def candidateEdges(phrases: DataFrame, cfg: LinkConfig = LinkConfig()): DataFrame = {
    val rows = cfg.numHashes / cfg.bands
    val p = phrases.select(col("phrase_id").cast("long").as("pid"),
      array_distinct(col("tokens")).as("toks"))

    // minhash signature: ONE shuffle — k min-aggregates side by side over the
    // exploded token table (vs exploding k seed copies of every token: k× the
    // shuffle volume and k× the groups, measured 4× slower at 44k phrases)
    val sigCols = (0 until cfg.numHashes)
      .map(i => min(xxhash64(lit(i), col("tok"))).as(s"mh$i"))
    val sigs = p.select(col("pid"), explode(col("toks")).as("tok"))
      .groupBy("pid")
      .agg(sigCols.head, sigCols.tail: _*)

    // band b = contiguous seed group [b·rows, (b+1)·rows); bkey = hash of the row values
    val bandCols = (0 until cfg.bands).map { b =>
      val rowCols = (0 until rows).map(r => col(s"mh${b * rows + r}"))
      struct(lit(b).as("band"), xxhash64(rowCols: _*).as("bkey"))
    }
    val bandKeys = sigs
      .select(col("pid"), explode(array(bandCols: _*)).as("bk"))
      .select(col("pid"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))

    // candidate pairs via self-join on bucket key (no array materialization);
    // bound pathological buckets by count first
    val okBuckets = bandKeys.groupBy("band", "bkey").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1 && col("c") <= cfg.maxBucketSize)
      .select("band", "bkey")
    val inBuckets = bandKeys.join(okBuckets, Seq("band", "bkey"))
    val pairs = inBuckets.select(col("band"), col("bkey"), col("pid").as("src"))
      .join(inBuckets.select(col("band"), col("bkey"), col("pid").as("dst")),
        Seq("band", "bkey"))
      .filter(col("src") < col("dst"))
      .select("src", "dst")
      .distinct()

    // exact Jaccard verify on token sets
    val withSets = pairs
      .join(p.select(col("pid").as("src"), col("toks").as("toksA")), "src")
      .join(p.select(col("pid").as("dst"), col("toks").as("toksB")), "dst")
      .withColumn("jaccard",
        size(array_intersect(col("toksA"), col("toksB"))).cast("double") /
          size(array_union(col("toksA"), col("toksB"))).cast("double"))
    withSets
      .filter(col("jaccard") >= cfg.jaccardThreshold)
      .select("src", "dst", "jaccard")
  }

  /**
   * Exact ALL-PAIRS Jaccard edges at `threshold` via a shared-token join —
   * the validation twin of `candidateEdges`. Pair generation is bounded by
   * token co-occurrence (O(Σ_tok df(tok)²)), not by LSH bucketing: correct on
   * phrase-scale tables, NOT a corpus-scale plan. Two uses: the SQL-oracled
   * exact entity path (kg_canon/kg_cooccur), and the LSH recall gate — KgSpec
   * pins `candidateEdges ⊆ exactEdges` (precision 1.0, guaranteed by the
   * exact verify) and recall == 1.0 at the entity threshold, so an LSH
   * regression that silently drops candidate pairs fails the suite rather
   * than nudging a row count.
   *
   * @param phrases DataFrame(phrase_id, tokens ARRAY<STRING>)
   * @return edges DataFrame(src BIGINT, dst BIGINT, jaccard DOUBLE), src < dst
   */
  def exactEdges(phrases: DataFrame, threshold: Double): DataFrame = {
    val p = phrases.select(col("phrase_id").cast("long").as("pid"),
      array_distinct(col("tokens")).as("toks"))
    val tok = p.select(col("pid"), explode(col("toks")).as("tok"))
    val sizes = tok.groupBy("pid").agg(count(lit(1)).as("sz"))
    val inter = tok.select(col("pid").as("src"), col("tok"))
      .join(tok.select(col("pid").as("dst"), col("tok")), Seq("tok"))
      .filter(col("src") < col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("pid").as("src"), col("sz").as("sa")), "src")
      .join(sizes.select(col("pid").as("dst"), col("sz").as("sb")), "dst")
      .withColumn("jaccard",
        col("i").cast("double") / (col("sa") + col("sb") - col("i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("src", "dst", "jaccard")
  }
}
