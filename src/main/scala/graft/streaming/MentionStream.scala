package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.artifact.TagModel
import graft.lake.LakeTable
import graft.model.Doc
import graft.tag.Tagger

/**
 * Streaming mention ingest: a document stream is auto-labeled with the
 * broadcast Aho-Corasick model (the tag stage is shuffle-free and therefore
 * stream-native — pinned by the stream↔batch parity test) and every
 * micro-batch's mentions are COMMITTED to a LakeTable stage via foreachBatch.
 *
 * Exactly-once into the lake without any sink transaction support: the
 * partition value is keyed by (batchId, url-hash bucket), and
 * `LakeTable.resumableWrite` skips partition values already in the snapshot
 * log — so a batch replayed after a failure (or an entire re-run of the same
 * bounded input with a fresh checkpoint) is a lake no-op, not a duplicate.
 * This is the standard Spark idempotent-foreachBatch pattern with the
 * snapshot log as the committed-batch ledger, and it composes with
 * `LakeTable.read(stage, asOfVersion)` for time-travel over the ingest
 * history.
 *
 * CONTRACT — batchId keys assume stable batch composition: wipe the
 * checkpoint ONLY to replay the identical input set. To ingest NEW files
 * into a growing directory, KEEP the checkpoint (the normal production
 * mode): Structured Streaming then assigns the new files fresh batch ids,
 * which commit as fresh lake partitions. Wiping the checkpoint after the
 * input has grown would renumber batches from 0 and the ledger would
 * silently skip the new data as "already committed".
 */
object MentionStream {

  /**
   * @param docs streaming Dataset of (docId, tokens)
   * @param bc   broadcast tag model (built batch-side)
   * @return the started query (AvailableNow trigger: drains the bounded
   *         input then stops — callers use processAllAvailable/awaitTermination)
   */
  def toLake(spark: SparkSession, docs: Dataset[Doc], bc: Broadcast[TagModel],
      lakeRoot: String, buckets: Int = 4, stage: String = "mentions_stream",
      cfg: Tagger.TagConfig = Tagger.TagConfig()): StreamingQuery = {
    val lake = new LakeTable(spark, lakeRoot)
    val mentions = Tagger.tag(spark, docs, bc, cfg).toDF()
      .select(col("docId").as("url"), explode(col("spans")).as("s"))
      .select(col("url"),
        col("s.start").as("start"), col("s.end").as("end"),
        col("s.phraseId").as("phrase_id"), col("s.label").as("label"))
    val commit: (DataFrame, Long) => Unit = { (batch, batchId) =>
      val keyed = batch.withColumn("part",
        concat_ws("-", lit(batchId),
          pmod(xxhash64(col("url")), lit(buckets.toLong))))
      lake.resumableWrite(keyed, "part", stage)
      ()
    }
    mentions.writeStream
      .foreachBatch(commit)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$lakeRoot/_stream_checkpoint_$stage")
      .start()
  }

  /** Convenience for tests/tools: cast a raw (doc_id, tokens) frame. */
  def asDocs(spark: SparkSession, df: DataFrame): Dataset[Doc] = {
    import spark.implicits._
    df.select(col("doc_id").cast("string").as("docId"), col("tokens")).as[Doc]
  }
}
