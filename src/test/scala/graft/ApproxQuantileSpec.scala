package graft

import org.scalatest.funsuite.AnyFunSuite

/** q51 (approx_percentile, GK sketch — buffer bounded by the accuracy
  * parameter, independent of the data domain) gated against its exact
  * anchor q44 (percentile — buffer grows with distinct values): same
  * groups, same counts, cut points within a relative-error bound. Same
  * exact-anchor/approx-path pattern the dedup family uses (RecallSpec).
  */
class ApproxQuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val MaxRelErr = 0.01 // accuracy=10000 → rank error 1e-4; 1% value slack is generous

  test("q51 approx percentiles track exact q44 within relative error") {
    val d = "/root/testdata/sf0.001"
    def byFlag(name: String): Map[String, (Double, Double, Double, Long)] =
      SparkEntry.queries(name)(spark, d).collect().map { r =>
        r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      }.toMap
    val exact = byFlag("q44_quantiles")
    val approx = byFlag("q51_quantiles_approx")
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    for (flag <- exact.keys) {
      val (ep25, ep50, ep75, en) = exact(flag)
      val (ap25, ap50, ap75, an) = approx(flag)
      assert(an == en, s"group $flag: counts differ ($an vs $en)")
      for (((e, a), p) <- Seq(ep25 -> ap25, ep50 -> ap50, ep75 -> ap75)
          .zip(Seq("p25", "p50", "p75"))) {
        val rel = math.abs(a - e) / math.max(math.abs(e), 1e-9)
        assert(rel <= MaxRelErr,
          s"group $flag $p: approx $a vs exact $e (rel err $rel > $MaxRelErr)")
      }
    }
  }
}
