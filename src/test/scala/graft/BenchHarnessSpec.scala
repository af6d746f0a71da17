package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must never reward failure: a query that throws is
  * reported as an error for that query, not billed as a suspiciously
  * fast time that LOWERS the total.
  */
class BenchHarnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a throwing query reports err, a working query reports a time") {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "good_query" -> ((s, _) => s.range(10).toDF("id")),
      // fails at execution time (not at plan build): the shape of a real
      // regression the old catch-and-ignore turned into a fast run
      "broken_query" -> ((s, _) =>
        s.range(10).toDF("id").select(
          when(col("id") >= 0, raise_error(lit("deliberately broken")))
            .otherwise(col("id")).as("id"))))
    val results = Bench.timeQueries(spark, "unused_dir", qs, runs = 1).toMap
    assert(results("broken_query").isLeft, "broken query must be reported as err")
    results("good_query") match {
      case Right(sec) => assert(sec > 0.0)
      case Left(e) => fail(s"good query reported err: $e")
    }
  }
}
