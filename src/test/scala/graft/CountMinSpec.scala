package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CountMin

/** q168 behavior pins: the CMS one-sided guarantee, element-wise
  * mergeability across corpus shards, per-row mass conservation, and a
  * driver-side md5 replay of the full counter matrix on a fixture.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q168: estimate is never below the exact count (one-sided guarantee)") {
    val rows = SparkEntry.queries("q168_countmin_sketch")(spark, d).collect()
    assert(rows.length == CountMin.TopN)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"token ${r.getString(0)} underestimated: ${r.getLong(2)} < ${r.getLong(1)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }

  test("q168: sketches of two corpus halves merge by addition into the full sketch") {
    val toks = Tables.documents(spark, d).select(col("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
    def mat(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
      CountMin.sketch(df.select("t")).collect()
        .map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    val full = mat(toks)
    val h1 = mat(toks.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 0))
    val h2 = mat(toks.filter(pmod(xxhash64(col("doc_id")), lit(2)) === 1))
    assert(h1.nonEmpty && h2.nonEmpty, "both halves must be populated")
    val merged = (h1.keySet ++ h2.keySet).map(k =>
      k -> (h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L))).toMap
    assert(merged == full, "element-wise sum of shard sketches != full sketch")
  }

  test("q168: every hash row conserves the total token mass") {
    val toks = Tables.documents(spark, d)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
    val n = toks.count()
    val rowMass = CountMin.sketch(toks).groupBy("r")
      .agg(sum(col("v")).as("m")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rowMass.size == 4)
    rowMass.foreach { case (r, m) =>
      assert(m == n, s"hash row $r holds $m of $n tokens")
    }
  }

  test("q172: streamed sketch keeps the one-sided guarantee; state is cell-bounded") {
    // sf0.01: 150 distinct users — more than one hash row's 64 cells,
    // so per-row collisions (the overcount mechanism) actually occur
    // while total state stays ≤ D×W keys no matter the cardinality
    val sf = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q172_stream_hotkey_cms")(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"user ${r.getLong(0)} underestimated after the stream"))
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(users > 64,
      s"fixture must overflow one hash row ($users users) to make the point")
  }

  test("q168: the engine counter matrix equals a driver-side md5 replay on a fixture") {
    val words = Seq("alpha", "beta", "beta", "gamma", "gamma", "gamma", "delta")
    val got = CountMin.sketch(words.map(Tuple1(_)).toDF("t")).collect()
      .map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    val exp = scala.collection.mutable.Map[(Int, Int), Long]().withDefaultValue(0L)
    words.foreach { w =>
      (0 until 4).foreach { r =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$w|$r".getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString
        val c = (java.lang.Long.parseLong(hex, 16) % 64).toInt
        exp((r, c)) += 1L
      }
    }
    assert(got == exp.toMap, s"engine $got vs replay $exp")
  }
}
