package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.FrameMemo

/** The build-once contract behind the shared edge lists: memoized only
  * for immutable testdata roots, always materialized, built exactly once
  * per (session, dir, key).
  */
class FrameMemoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("memoizable covers exactly the immutable roots, with path-separator boundaries") {
    assert(FrameMemo.memoizable("/root/testdata"))
    assert(FrameMemo.memoizable("/root/testdata/sf0.001"))
    // a SIBLING whose name extends the prefix is NOT immutable — treating
    // it as cached would serve stale bytes after a rewrite (the exact
    // hazard the guard exists for)
    assert(!FrameMemo.memoizable("/root/testdata_scratch"))
    assert(!FrameMemo.memoizable("/root/testdatax/sf0.001"))
    assert(!FrameMemo.memoizable("/tmp/graft_test"))
  }

  test("a memoizable dir builds once; later calls reuse the materialized frame") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; Seq(1, 2, 3).toDF("x") }
    val key = s"spec-${System.nanoTime()}" // unique per run: the memo is JVM-wide
    val first = FrameMemo.cached(spark, "/root/testdata/sf0.001", key)(build())
    val second = FrameMemo.cached(spark, "/root/testdata/sf0.001", key)(build())
    assert(builds == 1, "second call must not rebuild")
    assert(second eq first, "same materialized frame instance")
    // distinct key or dir = distinct artifact
    FrameMemo.cached(spark, "/root/testdata/sf0.01", key)(build())
    assert(builds == 2)
  }

  test("a non-memoizable dir builds fresh each call but still returns a materialized frame") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; Seq(1, 2, 3).toDF("x") }
    val a = FrameMemo.cached(spark, "/tmp/graft_memo_scratch", "k")(build())
    val b = FrameMemo.cached(spark, "/tmp/graft_memo_scratch", "k")(build())
    assert(builds == 2, "scratch dirs must not be cached — they can be rewritten")
    assert(!(a eq b))
    // materialized: consumers may iterate without re-running lineage; a
    // localCheckpoint'ed frame plans as an ExistingRDD scan
    assert(a.queryExecution.executedPlan.toString.contains("ExistingRDD"))
  }
}
