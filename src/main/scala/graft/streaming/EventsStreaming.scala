package graft.streaming

import scala.concurrent.duration._
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

  /** One closed session per user: events bridged by ≤30-min gaps. */
  case class SessionSummary(user_id: Long, n_events: Long,
                            start_micros: Long, end_micros: Long)

  /** Gap-based sessionization via flatMapGroupsWithState with event-time
    * timeout — the streaming twin of the batch q33_sessionize: state per
    * user holds the open session; a watermark-driven timeout closes and
    * emits it. This is the custom-state hook a feature-store /
    * attribution pipeline needs (bounded state, late-data aware).
    */
  def sessionize(s: SparkSession, events: DataFrame,
                 gap: FiniteDuration = 30.minutes): DataFrame = {
    import s.implicits._
    val gapMicros = gap.toMicros

    events
      .withWatermark("ts", "1 hour")
      // keep the watermarked ts column itself — projecting it into a
      // derived expression would drop the watermark and EventTimeTimeout
      // would be rejected
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        // state = the one open session: (start_us, end_us, n_events)
        (userId: Long, batch: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) => {
          if (state.hasTimedOut) {
            // watermark passed the open session's end + gap: close & emit
            val out = state.getOption.map { case (st, en, n) =>
              SessionSummary(userId, n, st, en)
            }
            state.remove()
            out.iterator
          } else {
            // fold open state + sorted batch into gap-bridged runs
            val incoming = batch.map(_._2.getTime * 1000L).toArray.sorted
              .map(t => (t, t, 1L))
            val all = state.getOption.toArray ++ incoming
            var runs = List.empty[(Long, Long, Long)]
            all.sortBy(_._1).foreach { case (st, en, c) =>
              runs match {
                case (ps, pe, pc) :: rest if st - pe <= gapMicros =>
                  runs = (ps, math.max(pe, en), pc + c) :: rest
                case _ => runs = (st, en, c) :: runs
              }
            }
            val sorted = runs.reverse
            // all but the newest run are closed (nothing can land inside
            // them: later events in this batch already didn't bridge)
            val closed = sorted.init
            val open = sorted.last
            state.update(open)
            state.setTimeoutTimestamp(open._2 / 1000 + gapMicros / 1000)
            closed.iterator.map { case (st, en, c) =>
              SessionSummary(userId, c, st, en)
            }
          }
        })
      .toDF()
  }

  /** Continuous warehouse maintenance: an Update-mode streaming
    * aggregation (state holds the running totals per key) feeds
    * `foreachBatch`, which MERGEs the corrected rows into the parquet
    * fact with the same idempotent upsert the batch loader uses
    * (StarOps.upsertFact) — the streaming version of
    * `load_to_postgres.py`'s `INSERT ... ON CONFLICT`. `foreachBatch` is
    * exactly the merge hook a Delta/Iceberg sink would formalize; on
    * plain parquet the commit is write-tmp-then-swap.
    */
  def upsertHourlyFact(s: SparkSession, events: DataFrame,
                       factDir: String): StreamingQuery = {
    val totals = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
    totals.writeStream
      .outputMode(OutputMode.Update) // emits only keys corrected this batch
      .foreachBatch { (updates: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val dst = new java.io.File(factDir)
        val merged =
          if (dst.exists())
            graft.pipeline.StarOps.upsertFact(
              s.read.parquet(factDir), updates.toDF(), Seq("hour", "event_type"))
          else updates.toDF()
        val tmpDir = factDir + ".tmp"
        merged.coalesce(1).write.mode("overwrite").parquet(tmpDir)
        import scala.reflect.io.Directory
        new Directory(dst).deleteRecursively()
        new java.io.File(tmpDir).renameTo(dst)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
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
