package graft

import org.scalatest.funsuite.AnyFunSuite

/** q201 behavior pins: a driver brute-force matrix replay (week
  * arithmetic, cohort assignment, distinct-activity counting) and the
  * retention laws on the corpus.
  */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q201: matrix equals a driver brute force") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    def week(ts: java.sql.Timestamp): Long =
      (ts.toLocalDateTime.toLocalDate.toEpochDay + 3) / 7
    val cohorts = ev.filter(_._3 == "signup").groupBy(_._1)
      .map { case (u, es) => u -> es.map(e => week(e._2)).min }
    val activity = ev.map(e => (e._1, week(e._2))).distinct
    val matrix = activity.flatMap { case (u, w) =>
      cohorts.get(u).filter(_ <= w).map(cw => (cw, w - cw))
    }.groupBy(identity).map { case ((cw, off), v) => (cw, off, v.size.toLong) }
    val sizes = cohorts.values.groupBy(identity).map { case (cw, v) => cw -> v.size.toLong }
    val expected = matrix.toSeq.sortBy(m => (m._1, m._2)).map { case (cw, off, n) =>
      (cw, sizes(cw), off, n, n * 1000000L / sizes(cw))
    }
    val got = SparkEntry.queries("q201_cohort_retention")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"engine:\n${got.mkString("\n")}\nexpected:\n${expected.mkString("\n")}")
  }

  test("q201: offset-0 retention is full and every ppm is valid") {
    val rows = SparkEntry.queries("q201_cohort_retention")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(3) <= r.getLong(1), s"active > cohort: $r")
      assert(r.getLong(4) <= 1000000L && r.getLong(4) > 0L, r.toString)
      // a signup event IS activity in the cohort week
      if (r.getLong(2) == 0L) assert(r.getLong(4) == 1000000L, s"offset-0 not full: $r")
    }
  }
}
