package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Salt

/**
 * Entity canonicalization + (subj, pred, obj) triple materialization
 * (SURVEY.md §7.5; north rule "triple extraction, entity linking,
 * canonicalization, graph materialize").
 *
 * Deterministic by construction: entity_id = min(phrase_id) per component;
 * canonical tokens = member with max salience_score (the reference's F4 ranking,
 * payload.rs:23-25), ties broken by lexicographic-min ngram.
 */
object Triples {

  /** Canonicalize phrase components into entities.
   * @param phrases DataFrame(phrase_id, ngram, tokens, salience, domain_count)
   * @param components DataFrame(id, component) from ConnectedComponents over
   *        Linker.candidateEdges — singleton phrases may be absent.
   * @return DataFrame(phrase_id, entity_id, canonical, is_canonical) */
  def entities(phrases: DataFrame, components: DataFrame): DataFrame = {
    val p = phrases.select(col("phrase_id").cast("long").as("phrase_id"),
      col("ngram"), col("salience").cast("float").as("salience"),
      col("domain_count").cast("long").as("domain_count"))
    val withComp = p
      .join(components.withColumnRenamed("id", "phrase_id"), Seq("phrase_id"), "left")
      .withColumn("entity_id", coalesce(col("component"), col("phrase_id")))
      .drop("component")
    // canonical member: max salience*ln(count+1), tie → lexicographic-min ngram
    val scoreCol = (col("salience") * log(col("domain_count").cast("double") + 1.0)).as("f4")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity_id"))
      .orderBy(col("f4").desc, col("ngram").asc)
    withComp
      .withColumn("f4", scoreCol)
      .withColumn("__rk", row_number().over(w))
      .withColumn("is_canonical", col("__rk") === 1)
      .withColumn("canonical", first(when(col("__rk") === 1, col("ngram")), ignoreNulls = true)
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("entity_id"))))
      .drop("__rk", "f4")
  }

  final case class TripleConfig(
      mentionPred: String = "mentions",
      cooccurPred: String = "co_occurs",
      maxEntitiesPerDoc: Int = 64, // caps the quadratic co-occurrence blowup
      saltBuckets: Int = 16,
      // entity-map size (plan-statistics estimate, bytes) above which the
      // mention⋈entity join falls back from broadcast to a shuffle join:
      // phrase-derived entity maps are phrase-scale and broadcast fine, but a
      // 100 TB corpus can plausibly grow 10⁸⁺ entities, which would OOM every
      // executor as a broadcast. 256 MB ≈ ~10M hashed (long, long) rows.
      broadcastEntityBytes: Long = 256L << 20)

  /**
   * Materialize triples from resolved mentions.
   * @param mentions DataFrame(url, warc_ts, start, end, phrase_id, label)
   * @param entityMap DataFrame(phrase_id, entity_id)
   * @return DataFrame(subj, pred, obj, url, warc_ts), salted-repartitioned on subj
   */
  def materialize(mentions: DataFrame, entityMap: DataFrame,
      cfg: TripleConfig = TripleConfig(), numPartitions: Int = 0): DataFrame = {
    val em = entityMap.select(col("phrase_id").cast("long").as("phrase_id"),
      col("entity_id").cast("long").as("entity_id"))
    // size-gated broadcast on the PLAN-STATISTICS estimate — the same basis
    // autoBroadcastJoinThreshold uses. No extra job (a count() here would
    // re-execute an unpersisted entity lineage in full), lazy, and
    // conservative: an unknown/overestimated size falls back to the shuffle
    // join, which AQE can still convert to a broadcast join at runtime from
    // exact shuffle statistics. The 8× multiplier covers the systematic
    // UNDERSHOOT of file-based estimates: for a parquet read-back the stats
    // are compressed-and-projection-scaled file bytes, while the hashed
    // relation lives on-heap as decompressed rows + hash structures — so the
    // effective gate is broadcastEntityBytes/8 of estimated input, in line
    // with Spark's own guidance of keeping autoBroadcastJoinThreshold far
    // below executor memory for the same reason.
    val emBytes = em.queryExecution.optimizedPlan.stats.sizeInBytes
    val emKeyed =
      if (emBytes * 8 <= BigInt(cfg.broadcastEntityBytes)) broadcast(em) else em
    val m = mentions
      .join(emKeyed, Seq("phrase_id"), "left")
      .withColumn("entity_id", coalesce(col("entity_id"), col("phrase_id").cast("long")))

    val mentionTriples = m.select(
      col("url").as("subj"), lit(cfg.mentionPred).as("pred"),
      concat(lit("entity:"), col("entity_id")).as("obj"),
      col("url"), col("warc_ts"))

    val coTriples = entityPairs(m, cfg)
      .select(
        concat(lit("entity:"), col("e1")).as("subj"), lit(cfg.cooccurPred).as("pred"),
        concat(lit("entity:"), col("e2")).as("obj"),
        col("url"), col("warc_ts"))

    val all = mentionTriples.unionByName(coTriples)
    // head-domain skew: url subjects follow a Zipf head; spread hot subjects
    val parts = if (numPartitions > 0) numPartitions
                else all.sparkSession.sessionState.conf.numShufflePartitions
    Salt.repartitionSalted(all, parts, col("subj"), cfg.saltBuckets, col("obj"), col("url"))
  }

  /** Per-document co-occurring entity pairs: distinct entities per url in
   * first-mention order (start, then entity_id), capped at
   * `cfg.maxEntitiesPerDoc` (bounds the quadratic pair blowup on entity-dense
   * pages), then unordered pairs emitted as e1 < e2 — deterministic.
   * @param m DataFrame(url, warc_ts, start, entity_id) — entity-resolved
   *          mentions (the post-join shape inside [[materialize]])
   * @return DataFrame(url, warc_ts, e1, e2) */
  def entityPairs(m: DataFrame, cfg: TripleConfig = TripleConfig()): DataFrame = {
    val perDoc = m.groupBy("url", "warc_ts")
      .agg(slice(array_distinct(sort_array(collect_list(
        struct(col("start"), col("entity_id"))))), 1, cfg.maxEntitiesPerDoc).as("ents"))
      .select(col("url"), col("warc_ts"),
        array_distinct(transform(col("ents"), e => e.getField("entity_id"))).as("eids"))
    perDoc
      .select(col("url"), col("warc_ts"), explode(col("eids")).as("e1"), col("eids"))
      .select(col("url"), col("warc_ts"), col("e1"), explode(col("eids")).as("e2"))
      .filter(col("e1") < col("e2"))
  }

  /** Weighted undirected entity co-occurrence edge list — the KG's
   * graph-materialize output in analytic form. Weight = number of documents
   * in which the pair co-occurs (each url contributes a pair at most once by
   * [[entityPairs]] construction). One aggregation shuffle on (e1, e2); the
   * per-doc cap already bounded the pair count upstream, so the edge keyspace
   * is O(min(docs · cap², entities²)) — at 100 TB the cap is what keeps this
   * from being quadratic in entities-per-page.
   * @param mentions DataFrame(url, warc_ts, start, end, phrase_id, label)
   * @param entityMap DataFrame(phrase_id, entity_id)
   * @return DataFrame(src, dst, w) with src < dst */
  def cooccurEdges(mentions: DataFrame, entityMap: DataFrame,
      cfg: TripleConfig = TripleConfig()): DataFrame = {
    val em = entityMap.select(col("phrase_id").cast("long").as("phrase_id"),
      col("entity_id").cast("long").as("entity_id"))
    val emBytes = em.queryExecution.optimizedPlan.stats.sizeInBytes
    val emKeyed =
      if (emBytes * 8 <= BigInt(cfg.broadcastEntityBytes)) broadcast(em) else em
    val m = mentions
      .join(emKeyed, Seq("phrase_id"), "left")
      .withColumn("entity_id", coalesce(col("entity_id"), col("phrase_id").cast("long")))
    entityPairs(m, cfg)
      .groupBy(col("e1").as("src"), col("e2").as("dst"))
      .agg(count(lit(1)).as("w"))
  }
}
