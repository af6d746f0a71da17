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

  test("scratch intermediates are released once the enclosing build materializes") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.storage.StorageLevel
    // win path: the artifact survives, the build-local intermediate's
    // blocks do not (r19 ADVICE: losing builds released only their FINAL
    // frame; nested checkpoints stayed block-store resident — and winning
    // builds held theirs forever)
    var inner: org.apache.spark.sql.DataFrame = null
    val built = FrameMemo.cached(spark, "/root/testdata/sf0.001",
      s"scratch-spec-${System.nanoTime()}") {
      inner = FrameMemo.scratch(Seq(1, 2, 3).toDF("x"))
      inner.select((org.apache.spark.sql.functions.col("x") * 2).as("y"))
    }
    assert(built.count() == 3, "artifact must stay readable after scratch release")
    assert(ColumnBridge.checkpointStorageLevel(inner).contains(StorageLevel.NONE),
      "build-local intermediate must be unpersisted once the artifact materializes")
    assert(!ColumnBridge.checkpointStorageLevel(built).contains(StorageLevel.NONE),
      "the memoized artifact itself must stay resident")
    // outside any build: plain localCheckpoint, caller owns the lifetime
    val free = FrameMemo.scratch(Seq(4).toDF("x"))
    assert(!ColumnBridge.checkpointStorageLevel(free).contains(StorageLevel.NONE))
    assert(free.count() == 1)
    ColumnBridge.releaseCheckpoint(free)
    // a THROWING build must release its scratch chain too
    var leaky: org.apache.spark.sql.DataFrame = null
    intercept[RuntimeException] {
      FrameMemo.cached(spark, "/root/testdata/sf0.001",
        s"scratch-boom-${System.nanoTime()}") {
        leaky = FrameMemo.scratch(Seq(5).toDF("x"))
        throw new RuntimeException("boom")
      }
    }
    assert(ColumnBridge.checkpointStorageLevel(leaky).contains(StorageLevel.NONE),
      "a failed build must not leak its partial scratch chain")
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
