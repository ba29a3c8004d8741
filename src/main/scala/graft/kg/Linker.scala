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

  final case class LinkConfig(
      numHashes: Int = 16,
      bands: Int = 4, // rows per band = numHashes / bands
      jaccardThreshold: Double = 0.5,
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

    // minhash signature: sig[i] = min over tokens of xxhash64(seed_i, token)
    val sigs = p.select(col("pid"), explode(col("toks")).as("tok"))
      .select(col("pid"), explode(sequence(lit(0), lit(cfg.numHashes - 1))).as("seed"), col("tok"))
      .groupBy("pid", "seed")
      .agg(min(xxhash64(col("seed"), col("tok"))).as("mh"))

    // band key = hash of the band's row values (order-canonical via sort within band)
    val bandKeys = sigs
      .withColumn("band", col("seed") % cfg.bands)
      .groupBy("pid", "band")
      .agg(xxhash64(col("band"), sort_array(collect_list(struct(col("seed"), col("mh"))))).as("bkey"))
    // sanity: every (pid, band) aggregates exactly `rows` seeds
    val _ = rows

    // candidate pairs within a bucket; bound pathological buckets
    val buckets = bandKeys.groupBy("band", "bkey")
      .agg(collect_set(col("pid")).as("pids"))
      .filter(size(col("pids")) > 1 && size(col("pids")) <= cfg.maxBucketSize)
    val pairs = buckets
      .select(explode(col("pids")).as("src"), col("pids"))
      .select(col("src"), explode(col("pids")).as("dst"))
      .filter(col("src") < col("dst"))
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
}
