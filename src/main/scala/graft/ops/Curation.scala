package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Training-data curation operators a 100-TB pretraining pipeline runs after
 * cleaning/dedup: stratified down-sampling to per-source quotas, greedy
 * sequence packing into fixed token-budget bins, and unigram-LM document
 * scoring (the CCNet-style perplexity filter, with the LM reduced to its
 * unigram core so the whole computation stays declarative and
 * oracle-checkable).
 *
 * Reference scope note: the reference has no curation layer at all — these
 * extend its weak-supervision pipeline toward the LLM-data workload per the
 * brief, and each is driven end-to-end by an oracled driver query
 * (`ta_sample_stratified`, `ta_pack_sequences`, `ta_lm_nll`).
 */
object Curation {

  /**
   * Deterministic stratified down-sampling to ≈`quota` rows per `keyCol`
   * group: a row survives iff `bucket(id) * n_key < quota * 65536`, where
   * `bucket` is the first 4 hex digits of md5(id) (uniform on [0, 65536))
   * and `n_key` is the group's row count. Keys at or under quota keep every
   * row; larger keys keep a quota/n_key fraction — the expected kept count
   * is `quota` for every oversampled key. All-integer arithmetic: no
   * float-rate drift between engines or between runs.
   *
   * Scale shape: ONE partial-agg shuffle over the (low-cardinality by
   * contract: sources / crawl snapshots / host buckets) key column to get
   * group sizes, broadcast back, then a NARROW filter over the corpus — the
   * corpus itself never shuffles. The exact-quota alternative (row_number
   * over a per-key window ordered by hash) would shuffle the whole corpus
   * on a skewed key; rate-thresholding is the 10^12-doc plan. Keys of
   * host-level cardinality (10^8+) should pre-aggregate to host buckets
   * first — the broadcast is the group-size table, so its size IS the
   * key cardinality.
   */
  def stratifiedSample(df: DataFrame, keyCol: String, idCol: String,
      quota: Long): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    Reserved.check("stratifiedSample", df.columns)
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("__n"))
    df.join(broadcast(counts), keyCol)
      .filter(
        conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
          .cast("long") * col("__n") < lit(quota * 65536L))
      .drop("__n")
  }

  /**
   * Greedy sequential sequence packing: within each `groupCol` shard, in
   * ascending `idCol` order, documents fill bins of at most `budget` tokens;
   * a document that would overflow the open bin starts the next one, and a
   * single document longer than the budget gets a bin of its own (never
   * split, never dropped — the downstream trainer decides truncation).
   * Returns the input keys plus a 0-based `bin` per group.
   *
   * This is the standard "pack short documents into fixed context windows"
   * step before LLM pretraining; the sequential (id-ordered) variant is the
   * deterministic one — first-fit-decreasing packs ~few % tighter but its
   * output depends on global length order, which a distributed pipeline
   * cannot reproduce stably under re-partitioning.
   *
   * Scale shape: one shuffle on `groupCol` (groupByKey), then a per-group
   * in-memory greedy scan — the same "one shard fits one task" contract as
   * blockedCosinePairs; shards are source × day partitions in production,
   * bounded by construction. The greedy scan is O(shard), not O(shard²).
   *
   * Output columns keep the INPUT schema's types: the greedy scan runs over
   * string/long casts (the typed-Dataset encoding), and the result re-casts
   * back, which round-trips losslessly for string / integral / floating /
   * date group keys and integral id/len columns (round-4 advice — the casts
   * used for groupByKey must not leak into the output schema). Exotic key
   * types (binary, struct) should be pre-mapped to a string key upstream.
   */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
      lenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    Reserved.check("packSequences", df.columns)
    val spark = df.sparkSession
    import spark.implicits._
    val (gType, idType, lenType) =
      (df.schema(groupCol).dataType, df.schema(idCol).dataType, df.schema(lenCol).dataType)
    val rows = df.select(col(groupCol).cast("string"),
        col(idCol).cast("long"), col(lenCol).cast("long"))
      .as[(String, Long, Long)]
    rows.groupByKey(_._1).flatMapGroups { (g, it) =>
      val docs = it.toArray.sortInPlaceBy(_._2)
      var bin = 0L
      var acc = 0L
      docs.iterator.map { case (_, id, len) =>
        if (acc > 0L && acc + len > budget) { bin += 1L; acc = 0L }
        acc += len
        (g, id, len, bin)
      }
    }.toDF(groupCol, idCol, lenCol, "bin")
      .select(col(groupCol).cast(gType), col(idCol).cast(idType),
        col(lenCol).cast(lenType), col("bin"))
  }

  /**
   * Unigram-LM negative log-likelihood per document with add-one smoothing —
   * the declarative core of the CCNet/Wikipedia-LM perplexity filter:
   * `nll(doc) = -avg_t ln((count(t) + 1) / (N + V))` where counts come from
   * `lmToks` (the training corpus) and scoring runs over `toks`. High nll =
   * improbable under the corpus distribution = gibberish/boilerplate
   * candidates; filter or stratify on it downstream.
   *
   * Scale shape: token counts are one partial-agg shuffle; the scoring join
   * is token-keyed and vocabulary-sized on the build side, so Catalyst
   * broadcasts vocab-scale LMs and shuffle-joins genuinely huge ones —
   * both correct, both declarative. Totals ride a broadcast 1-row cross
   * join. Out-of-vocabulary tokens (scoring corpus ≠ training corpus)
   * score as pure smoothing mass, ln((0+1)/(N+V)), via the left join.
   *
   * The count table is eagerly materialized (localCheckpoint — vocab-scale
   * rows, blocks freed by the ContextCleaner): without it, BOTH the totals
   * aggregate and the score join would re-derive the counts subtree and the
   * training corpus would be scanned+tokenized three times instead of once
   * (pinned in CurationPlansSpec). Fault-tolerance trade: localCheckpoint
   * truncates lineage and keeps blocks on EXECUTORS only, so losing an
   * executor mid-job fails the run (rerun recomputes from scratch) — for a
   * production vocabulary you want durable across executor loss, persist
   * the counts to storage (`counts.write.parquet(...)` + re-read) or set a
   * reliable `sparkContext.setCheckpointDir` and use `checkpoint()` instead;
   * the executor-block variant is the right default for the vocab-scale
   * table this computes (round-4 advice).
   */
  def lmScore(toks: DataFrame, idCol: String, tokCol: String,
      lmToks: Option[DataFrame] = None): DataFrame = {
    val scoreTerms = toks.select(col(idCol), explode(col(tokCol)).as("tok"))
    val trainTerms = lmToks match {
      case Some(lm) => lm.select(explode(col(tokCol)).as("tok"))
      case None     => scoreTerms.select(col("tok"))
    }
    val counts = trainTerms.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("cnt")).cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    scoreTerms.join(counts, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (-log((coalesce(col("cnt"), lit(0L)).cast("double") + 1.0) /
          (col("__n") + col("__v")))).as("term"))
      .groupBy(idCol).agg(avg(col("term")).as("nll"))
  }
}
