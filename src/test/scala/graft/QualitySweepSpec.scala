package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.qualityScore

/** q181 behavior pins: a driver-side brute-force replay of the curve
  * from the engine's own per-doc quality scores, curve laws, and
  * consistency with q22's fixed buckets.
  */
class QualitySweepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q181: corpus sweep equals a brute force from per-doc scores") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .select(qualityScore(col("text")).as("q"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    val totalDocs = docs.size.toLong
    val totalToks = docs.map(_._2).sum
    val expected = (1 to 9).map { b =>
      // drop iff quality < b/10 — via the same decile-bucket assignment
      // the engine uses, so a boundary-exact score lands identically
      val dropped = docs.filter(d => math.min(math.floor(d._1 * 10).toInt, 9) < b)
      val nd = dropped.size.toLong
      val toks = dropped.map(_._2).sum
      (b * 10, nd, toks, nd * 1000000L / totalDocs, toks * 1000000L / totalToks)
    }
    val got = SparkEntry.queries("q181_quality_threshold_sweep")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"engine:\n${got.mkString("\n")}\nexpected:\n${expected.mkString("\n")}")
    // curve laws: monotone nondecreasing in t; ppm bounded; the curve
    // must separate (not all-0 and not all-total on this corpus)
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3)
    }
    got.foreach(r => assert(r._4 >= 0 && r._4 <= 1000000L))
    assert(got.last._2 > got.head._2, "sweep must separate on the corpus")
  }

  test("q181 agrees with q22's fixed low bucket at t=0.5") {
    val sf = "/root/testdata/sf0.001"
    val low = SparkEntry.queries("q22_text_quality")(spark, sf)
      .filter(col("quality_bucket") === "low").count()
    val at50 = SparkEntry.queries("q181_quality_threshold_sweep")(spark, sf)
      .filter(col("threshold_pct") === 50).head().getLong(1)
    assert(at50 == low, s"sweep at 0.5 ($at50) must equal q22's low bucket ($low)")
  }
}
