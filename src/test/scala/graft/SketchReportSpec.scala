package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q220's envelopes must be REAL gates: every registered estimate sits
  * inside its documented guarantee on the corpus, the exact sides match
  * independent recomputes, and a deliberately out-of-envelope estimate
  * flips `within` — the report can fail, it just provably doesn't.
  */
class SketchReportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private lazy val rows = ops.SketchReport.report(spark, d).collect()
    .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))

  test("every section is populated and every estimate is in envelope") {
    val bySketch = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySketch.keySet == Set("q61_hll_lgk12", "q73_mg_k64",
      "q51_gk_prices_acc10k", "q98_gk_quality_acc10k", "q226_mrl_k1024"),
      s"sections: $bySketch")
    // 3 cuts x |flags|, 9 cuts x |langs|; HLL = days + ALL; MG >= 1
    assert(bySketch("q51_gk_prices_acc10k") % 3 == 0 &&
      bySketch("q51_gk_prices_acc10k") >= 3)
    // the MRL section gates the same price population and cut set
    assert(bySketch("q226_mrl_k1024") == bySketch("q51_gk_prices_acc10k"))
    assert(bySketch("q98_gk_quality_acc10k") % 9 == 0 &&
      bySketch("q98_gk_quality_acc10k") >= 9)
    assert(bySketch("q61_hll_lgk12") >= 2, "needs >= 1 day + the ALL row")
    assert(bySketch("q73_mg_k64") >= 1, "degenerate: no guaranteed survivors")
    val out = rows.filter(!_._4)
    assert(out.isEmpty, s"estimates outside their documented envelope: ${out.toSeq}")
  }

  test("exact sides match independent recomputes") {
    // HLL section's exact_v = exact distinct users (ALL row spot check)
    val allRow = rows.filter(r => r._1 == "q61_hll_lgk12" && r._2 == "ALL").head
    val exactAll = Tables.events(spark, d)
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(allRow._3 == exactAll.toDouble)
    // MG section's item set = exactly the guaranteed survivors
    import graft.functions.TextFunctions.tokens
    val toks = Tables.documents(spark, d)
      .select(explode(tokens(col("text"))).as("token"))
    val nTok = toks.count()
    val expectHeavy = toks.groupBy("token").count().collect()
      .filter(r => r.getLong(1) * (ops.TextAnalysis.MgSketchK + 1) > nTok)
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val mgRows = rows.filter(_._1 == "q73_mg_k64").map(r => r._2 -> r._3).toMap
    assert(mgRows == expectHeavy,
      s"MG item set/exact counts drifted: ${mgRows.keySet} vs ${expectHeavy.keySet}")
  }

  test("the GK rank-window gate trips on an out-of-envelope estimate") {
    import spark.implicits._
    // population 1..1000; a true GK cut for p50 is ~500. Plant 900 (rank
    // error 400 >> n/acc + 1 = 1.1) -> within must be FALSE; plant 500
    // -> TRUE. Proves `within` is estimate-sensitive, not vacuous.
    val pop = (1 to 1000).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val verdict = (cut: Double) => ops.SketchReport.gkSection("t",
      pop, Seq(("g", Seq(cut), 1000L)).toDF("grp", "cuts", "records")
        .withColumn("tol",
          col("records").cast("double") / ops.SketchReport.GkAccuracy + 1.0),
      Seq(0.5), Seq("p50")).collect().head
    val badRow = verdict(900.0)
    assert(!badRow.getBoolean(3), s"gate must trip: $badRow")
    val goodRow = verdict(500.0)
    assert(goodRow.getBoolean(3), s"gate must pass a true median: $goodRow")
    // and the exact side is the true interpolated median regardless
    assert(goodRow.getDouble(2) == 500.5)
  }

  test("the MG and HLL gates trip when fed a broken estimate frame") {
    // integer-exact band arithmetic: 5% of 100 = 5 -> 104 passes, 106 fails
    def hllWithin(est: Long, exact: Long): Boolean =
      math.abs(est - exact) * 100 < exact * ops.SketchReport.HllBandPct
    assert(hllWithin(104, 100) && !hllWithin(106, 100) && !hllWithin(95, 100))
  }
}
