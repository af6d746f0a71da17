package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming over the `events` table: the same aggregation
  * logic as the batch twins in graft.ops.EventsOps, expressed as
  * unbounded plans with watermarks. The reference is batch-only
  * (SURVEY §2.9); this is the engine's streaming extension.
  */
object EventsStreaming {

  /** Unbounded source from an events parquet directory (schema taken
    * from a batch read of the same path — streaming sources require an
    * explicit schema).
    */
  def readEvents(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(dir).schema
    val raw = s.readStream.schema(schema).parquet(dir)
    // same ns→µs normalization as Tables.events
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else raw
  }

  /** Tumbling 1-hour windowed counts per event type with a 2-hour
    * watermark: late events beyond the watermark are dropped, state is
    * bounded — the streaming twin of q32_events_hourly.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("total_value"))

  /** Per-user running event count via mapGroupsWithState — the custom
    * stateful-processing hook (KeyValueGroupedDataset) a
    * sessionization/feature-store pipeline uses.
    */
  def runningUserCounts(s: SparkSession, events: DataFrame): DataFrame = {
    import s.implicits._
    events
      .selectExpr("user_id", "event_id")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.size
          state.update(total)
          (userId, total)
      }
      .toDF("user_id", "n_events")
  }

  /** Drive a streaming frame to completion against the (bounded) parquet
    * source via a memory sink; returns the materialized result table.
    * Used by tests and local verification — production would write to a
    * real sink with `trigger(Trigger.ProcessingTime(...))`.
    */
  def runToMemory(s: SparkSession, streamed: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append): DataFrame = {
    val q: StreamingQuery = streamed.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }
}
