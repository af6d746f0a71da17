package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cheap shape checks for every registered query at sf0.001 (full value
  * equality vs DuckDB runs through graft.Verify + tools/check.py and the
  * driver's oracle).
  */
class ParityQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every query has oracle SQL or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed but must be intentional:
    assert(noOracle.forall(SparkEntry.rowsOnlyQueries.contains),
      s"queries missing oracle sql and not declared rows-only: $noOracle")
  }

  test("oracle SQL keys all exist as queries") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle entries with no query: $dangling")
  }

  test("all queries execute and return rows at sf0.001") {
    val empties = Seq("q09_customers_no_orders") // legitimately empty at tiny SF
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (!empties.contains(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
