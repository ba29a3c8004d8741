package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming layer. The reference is pure batch (SURVEY.md §2.10 —
 * its "streaming" means line-at-a-time constant memory), so this is the
 * forward-looking streaming surface over the `events` table shape
 * (event_id, ts, user_id, event_type, value, props): watermarked tumbling
 * windows for the aggregation path and mapGroupsWithState for custom state.
 * Batch/stream parity is pinned in StreamingSpec (same input dir → identical
 * results through readStream + memory sink vs the batch plan).
 */
object EventStream {

  /** Watermarked hourly tumbling-window aggregation — the streaming twin of
   * the q4_events_hourly batch query. Works on both stream and batch frames. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      // parquet may carry TIMESTAMP_NTZ; watermarks require TIMESTAMP (tz-aware)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserStats(userId: Long, events: Long, totalValue: Double)

  /** Custom keyed state: running per-user totals via mapGroupsWithState.
   * In a stream this emits the updated state per trigger; in tests it runs on
   * a bounded stream via the memory sink. */
  def userTotals(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserStats] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0))
          var n = prev.events
          var v = prev.totalValue
          it.foreach { e => n += 1; v += e.value }
          val next = UserStats(userId, n, v)
          state.update(next)
          next
      }
  }

  final case class SessEvent(user_id: Long, us: Long, ts: java.sql.Timestamp)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  final case class PendingSessions(sessions: Seq[OpenSession])
  final case class ClosedSession(user_id: Long, start_us: Long, n_events: Long, dur_us: Long)

  /**
   * Streaming session windows (the stream twin of the `q9_sessionize` batch
   * query): per-user sessions split at `gapUs` inactivity, built with
   * flatMapGroupsWithState + EventTimeTimeout — the canonical arbitrary-state
   * streaming pattern.
   *
   * A session EMITS only when the event-time watermark passes its
   * last-event + gap — never eagerly when a later event arrives past the
   * gap. Eager emission (the naive formulation) breaks the batch twin under
   * cross-batch disorder: an event above the watermark but inside an
   * already-emitted session's envelope (e.g. events 0 s then 3000 s in
   * earlier batches, 1500 s arriving later with gap 1800 s) would bridge two
   * sessions batch-q9 counts as ONE, and append mode can never retract the
   * early emission. Instead the state holds ALL pending sessions of the
   * user; each batch merges new events in (an event within gap of two
   * pending sessions bridges them, summing counts) and only sessions whose
   * envelope the watermark has strictly passed — which no future event ≥
   * watermark can ever extend — are emitted. Stream == batch for every
   * disorder the watermark admits (pinned in MultimodalStreamingSpec,
   * including the bridge case above).
   *
   * State stays bounded: a pending session matures one gap after its last
   * event, so per user there are at most O(watermarkDelay / gap) + 1 pending
   * sessions regardless of stream length; Spark drops events older than the
   * watermark before they reach the state function. Lateness bound (the
   * standard watermark trade-off, stated honestly): the watermark is GLOBAL
   * — max event time across ALL users minus `watermarkDelay` — so an event
   * more than `watermarkDelay` behind the stream's frontier is dropped even
   * if its own user's pending session could still have absorbed it (one
   * user's burst can advance the frontier past another user's straggler),
   * and such a drop under-counts that session vs the batch twin. That loss
   * window is exactly `watermarkDelay`, tunable per deployment ("0 seconds"
   * would drop ANY cross-batch disorder; raise the delay to tolerate more
   * frontier skew at the price of later emission and more pending state).
   * Time math is in event-time MICROSECONDS end-to-end (like q9).
   */
  def sessionWindows(spark: SparkSession, events: DataFrame,
      gapUs: Long = 1800000000L, watermarkDelay: String = "30 minutes"): Dataset[ClosedSession] = {
    import spark.implicits._
    val typed = events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("us"), col("ts"))
      .as[SessEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[PendingSessions, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[PendingSessions]) =>
          // one code path for data batches AND timeout wake-ups (the iterator
          // is simply empty on timeout): merge, then emit what matured
          val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val incoming = it.map(e => OpenSession(e.us, e.us, 1L)).toSeq
          val all = (prior ++ incoming).sortBy(s => (s.startUs, s.lastUs))
          val merged = Vector.newBuilder[OpenSession]
          var cur: OpenSession = null
          all.foreach { s =>
            if (cur == null) cur = s
            else if (s.startUs <= cur.lastUs + gapUs)
              cur = OpenSession(cur.startUs, math.max(cur.lastUs, s.lastUs), cur.n + s.n)
            else { merged += cur; cur = s }
          }
          if (cur != null) merged += cur
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // strict <: a future event can be exactly AT the watermark and
          // still extend a session whose envelope touches it
          val (matured, pending) = merged.result().partition(_.lastUs + gapUs < wmUs)
          if (pending.nonEmpty) {
            state.update(PendingSessions(pending))
            // earliest maturity, ms epoch, strictly past the merge envelope;
            // kept sessions satisfy lastUs + gap >= wmUs so this is always
            // above the current watermark (setTimeoutTimestamp's contract)
            state.setTimeoutTimestamp(pending.map(s => (s.lastUs + gapUs) / 1000L).min + 1L)
          } else state.remove()
          matured.iterator.map(s => ClosedSession(uid, s.startUs, s.n, s.lastUs - s.startUs))
      }
  }

  /** Run a streaming query over a bounded parquet directory synchronously:
   * readStream → transform → memory sink → processAllAvailable. */
  def runBounded(spark: SparkSession, inputDir: String,
      transform: DataFrame => DataFrame, queryName: String,
      outputMode: OutputMode = OutputMode.Append()): DataFrame = {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val q = transform(stream).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
