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
