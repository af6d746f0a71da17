package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dsir

/** q157 DSIR: the oracle hash proves engine ≡ SQL replay; this spec
  * proves the importance weighting does its JOB — a separable fixture
  * through the exact production path (target-like raw docs must outrank
  * target-unlike ones), plus shape sanity on the real corpus.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("separable fixture: target-like raw docs outrank target-unlike ones") {
    import spark.implicits._
    // target (src0) speaks 'alpha beta'; raw doc 10 speaks the target's
    // language, raw doc 11 a disjoint one, raw doc 12 a half-overlap
    val docs = Seq(
      (1L, "src0", "alpha beta alpha beta alpha"),
      (2L, "src0", "beta alpha beta alpha beta"),
      (10L, "srcX", "alpha beta alpha beta"),
      (11L, "srcX", "zeta omega zeta omega"),
      (12L, "srcX", "alpha omega alpha omega")
    ).toDF("doc_id", "source", "text")
    val out = Dsir.importanceSelectOn(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(10L, 11L, 12L), s"raw pool is docs 10-12, got $out")
    assert(out(10L) > out(12L) && out(12L) > out(11L),
      s"importance must order target-like > mixed > disjoint: $out")
    // sign sanity: an all-target-vocabulary doc scores positive (its
    // buckets are likelier under p̂ than q̂), an all-disjoint one negative
    assert(out(10L) > 0, s"target-like doc scored ${out(10L)} <= 0")
    assert(out(11L) < 0, s"disjoint doc scored ${out(11L)} >= 0")
  }

  test("real corpus: top-K raw docs only, no target docs, scores strictly ordered") {
    val rows = SparkEntry.queries("q157_dsir_select")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == Dsir.SelectK)
    assert(rows.forall(_.getString(1) != Dsir.TargetSource),
      "a target-source doc leaked into the raw selection")
    val scores = rows.map(_.getLong(2)).toSeq
    assert(scores == scores.sorted.reverse, "selection must be score-ordered")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
