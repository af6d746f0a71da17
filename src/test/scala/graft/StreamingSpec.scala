package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStreaming

/** Structured Streaming over the events table: the streaming plans must
  * produce the same answers as their batch twins once the bounded source
  * is fully consumed.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** FileStreamSource needs a directory; stage the single testdata file
    * into one.
    */
  private lazy val dir: String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Paths.get("/tmp/graft_stream/events")
    Files.createDirectories(d)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("streaming hourly counts match the batch aggregation") {
    val stream = EventsStreaming.readEvents(spark, dir)
    val got = EventsStreaming.runToMemory(
      spark, EventsStreaming.hourlyCounts(stream), "hourly_test")
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
    // watermark append-mode emits only windows older than the watermark;
    // every emitted window must match its batch twin exactly
    val joined = got.as("g").join(batch.as("b"),
      col("g.hour") === col("b.hour") && col("g.event_type") === col("b.event_type"))
    assert(got.count() > 0)
    assert(joined.filter(col("g.n") =!= col("b.n")).isEmpty)
    assert(joined.count() == got.count())
  }

  test("streaming sessionization closes sessions the batch twin finds") {
    import org.apache.spark.sql.functions._
    val stream = EventsStreaming.readEvents(spark, dir)
    val got = EventsStreaming.runToMemory(spark,
      EventsStreaming.sessionize(spark, stream), "sessions_test")
    // AvailableNow on a bounded source: watermark advances to max(ts)
    // after the batch, so sessions ending >1h+gap before it are closed.
    // Each closed session's event count must match the batch q33 logic:
    // total closed-session events per user <= batch per-user counts
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val perUser = got.groupBy("user_id")
      .agg(sum(col("n_events")).as("closed_events"))
    val joined = perUser.join(batch, "user_id")
    assert(got.count() > 0)
    assert(joined.filter(col("closed_events") > col("n_events")).isEmpty)
    // session invariant: no zero/negative counts, start <= end
    assert(got.filter(col("n_events") <= 0 ||
      col("start_micros") > col("end_micros")).isEmpty)
  }

  test("foreachBatch streaming upsert converges to the batch fact") {
    import org.apache.spark.sql.functions._
    val factDir = "/tmp/graft_stream/fact_hourly"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(factDir)).deleteRecursively()
    val stream = EventsStreaming.readEvents(spark, dir)
    val q = EventsStreaming.upsertHourlyFact(spark, stream, factDir)
    q.awaitTermination()
    val got = spark.read.parquet(factDir)
    val want = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // idempotent: re-running the whole stream over the same input
    // converges to the same fact (upsert replaces by key)
    val q2 = EventsStreaming.upsertHourlyFact(spark,
      EventsStreaming.readEvents(spark, dir), factDir)
    q2.awaitTermination()
    val again = spark.read.parquet(factDir)
    assert(again.exceptAll(want).isEmpty && want.exceptAll(again).isEmpty)
  }

  test("stateful running user counts consume all events") {
    val stream = EventsStreaming.readEvents(spark, dir)
    val got = EventsStreaming.runningUserCounts(spark, stream)
    val res = EventsStreaming.runToMemory(spark, got, "usercounts_test",
      OutputMode.Update())
    // final state per user = total events per user (single AvailableNow batch)
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val latest = res.groupBy("user_id").agg(max("n_events").as("n_events"))
    assert(latest.exceptAll(batch).isEmpty && batch.exceptAll(latest).isEmpty)
  }
}
