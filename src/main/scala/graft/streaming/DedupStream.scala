package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ingest-time streaming deduplication — drop exact-duplicate documents as
 * they arrive, BEFORE they cost downstream mining/tagging/lake storage.
 *
 * The scale problem this solves: plain `dropDuplicates` on a stream keeps
 * EVERY key ever seen in the state store — at 10^12 documents that state is
 * the corpus, and the job dies long before. `dropDuplicatesWithinWatermark`
 * bounds state to the watermark horizon: a duplicate is dropped iff it
 * arrives within `horizon` of the retained first occurrence's event time.
 * That matches how crawl duplicates actually cluster (re-fetches and mirror
 * pages land within hours/days of each other); cross-horizon duplicates are
 * the lake compaction / batch-dedup layer's job (`dd_exact` and the MinHash
 * paths), which this stage makes dramatically cheaper by thinning the head.
 *
 * Semantics pinned in DedupStreamSpec:
 *  - within the horizon, output == batch `dropDuplicates(keys)` on the same
 *    input (exactly-one-survivor parity);
 *  - a duplicate arriving AFTER its key's state expired is emitted again —
 *    the documented state-bound tradeoff, not a silent anomaly;
 *  - keying on a content hash (md5 of text) rather than raw text keeps the
 *    state-store value small and matches the batch `dd_exact` key.
 *
 * Shape: one stateful exchange on the dedup key (the same shuffle the batch
 * distinct pays), zero driver-side state; composes ahead of
 * [[MentionStream.toLake]] in an ingest pipeline.
 */
object DedupStream {

  /** Exact dedup on explicit key columns within the watermark horizon.
   * @param docs    streaming DataFrame with event-time column `tsCol`
   * @param keys    duplicate-identity columns (e.g. the content hash)
   * @param tsCol   event-time column (TIMESTAMP)
   * @param horizon watermark delay, e.g. "1 hour" — the dedup window AND the
   *                state bound */
  def dedupWithin(docs: DataFrame, keys: Seq[String], tsCol: String,
      horizon: String): DataFrame = {
    require(keys.nonEmpty, "dedupWithin needs ≥ 1 key column")
    require(!keys.contains(tsCol),
      s"event-time column '$tsCol' cannot be a dedup key: two fetches of the " +
        "same content at different times must collide to deduplicate, and " +
        "dropDuplicatesWithinWatermark already scopes keys by event time")
    docs.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keys)
  }

  /** Content-hash dedup for web pages: keys on md5(text) — the batch
   * `dd_exact` identity — so re-fetches and mirrors collapse regardless of
   * url, keeping one row per distinct body per horizon. */
  def dedupByContent(pages: DataFrame, textCol: String = "text",
      tsCol: String = "warc_ts", horizon: String = "1 hour"): DataFrame =
    dedupWithin(pages.withColumn("__content_key", md5(col(textCol))),
      Seq("__content_key"), tsCol, horizon)
      .drop("__content_key")
}
