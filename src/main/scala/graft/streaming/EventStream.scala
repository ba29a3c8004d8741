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
  final case class ClosedSession(user_id: Long, start_us: Long, n_events: Long, dur_us: Long)

  /**
   * Streaming session windows (the stream twin of the `q9_sessionize` batch
   * query): per-user sessions split at `gapUs` inactivity, built with
   * flatMapGroupsWithState + EventTimeTimeout — the canonical arbitrary-state
   * streaming pattern. A session CLOSES (and emits) either when a later
   * event of the same user arrives past the gap, or when the event-time
   * watermark passes sessionEnd + gap (timeout) — so output is append-only
   * and state is bounded at one open session per active user.
   *
   * Disorder contract: events are sorted within each micro-batch group;
   * across batches the watermark bounds lateness — an event landing inside
   * the open session's [start − gap, last + gap] envelope merges into it,
   * anything later starts a new session, and Spark DROPS events older than
   * the watermark before they reach the state function. The default delay
   * therefore equals the session gap: an event late enough to be dropped is
   * also too late to merge into any session that could still be open, so the
   * default loses nothing a 30-minute-gap sessionizer could use ("0 seconds"
   * would silently drop ANY cross-batch disorder). Time math is in
   * event-time MICROSECONDS end-to-end (like q9).
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
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          val out = Vector.newBuilder[ClosedSession]
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap: nothing can merge anymore
            state.getOption.foreach(o =>
              out += ClosedSession(uid, o.startUs, o.n, o.lastUs - o.startUs))
            state.remove()
          } else {
            val evs = it.map(_.us).toArray
            java.util.Arrays.sort(evs)
            var open = state.getOption
            evs.foreach { us =>
              open match {
                case Some(o) if us >= o.startUs - gapUs && us <= o.lastUs + gapUs =>
                  open = Some(OpenSession(math.min(o.startUs, us),
                    math.max(o.lastUs, us), o.n + 1))
                case Some(o) =>
                  out += ClosedSession(uid, o.startUs, o.n, o.lastUs - o.startUs)
                  open = Some(OpenSession(us, us, 1))
                case None =>
                  open = Some(OpenSession(us, us, 1))
              }
            }
            open.foreach { o =>
              state.update(o)
              // ms epoch, strictly past the merge envelope
              state.setTimeoutTimestamp((o.lastUs + gapUs) / 1000 + 1)
            }
          }
          out.result().iterator
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
