package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential + regression coverage for the analytics extras:
  *
  *   - the INTERSECT/EXCEPT retention twin must produce exactly the
  *     single-scan q39 answer (keeps `.intersect`/`.except` live-covered
  *     without paying 6 orders scans in the registered query surface);
  *   - q40's raw HLL estimate is pinned (the registered query only
  *     oracle-compares the within-10% claim, which would hide any
  *     regression that stays inside the band — HLL++ at fixed rsd on
  *     fixed data is deterministic, so the exact estimate is assertable).
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.01"

  test("retention set-op twin matches the single-scan q39 form") {
    val setOps = ops.AnalyticsExtras.retentionSetOps(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val oneScan = SparkEntry.queries("q39_retention_setops")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(setOps.nonEmpty)
    assert(setOps == oneScan)
  }

  test("q58 native session windows agree with the lag-based q33 sessions") {
    // identical gap semantics except at EXACTLY-30-min gaps (>= vs >),
    // which the continuous-timestamp testdata never hits: per-user
    // session counts and event totals must match
    val sw = SparkEntry.queries("q58_session_window")(spark, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val lagForm = SparkEntry.queries("q33_sessionize")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sw.nonEmpty && sw == lagForm)
  }

  test("q40 raw HLL estimate is deterministic and pinned at rsd=0.02") {
    val est = Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // pinned values: a regression in the sketch (rsd plumbing, hashing,
    // estimator constants) that stays inside q40's 10% band is invisible
    // to the oracle compare but visible here
    assert(est == Seq(("A", 2019L, 2000L), ("N", 2019L, 2000L), ("R", 2019L, 2000L)),
      s"HLL estimate drifted: $est")
  }
}
