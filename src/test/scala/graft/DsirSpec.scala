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

  test("q160 gumbel key replays by hand; resampling diversifies but tracks the weights") {
    val d = "/root/testdata/sf0.001"
    val res = SparkEntry.queries("q160_dsir_gumbel")(spark, d).collect()
    assert(res.length == Dsir.SelectK)
    // hand-replay the hash-derived Gumbel key for every selected doc:
    // md5 of the stringified id -> first 8 hex chars -> u -> g
    res.foreach { r =>
      val (id, score, gkey) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val u = ((java.lang.Long.parseLong(hex, 16) % (1L << 20)) + 0.5) / (1L << 20).toDouble
      val g = java.math.BigDecimal.valueOf(-math.log(-math.log(u)) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      assert(gkey == score + g, s"doc $id: gkey $gkey != score $score + gumbel $g")
    }
    // proportional sampling must (a) not equal the argmax selection —
    // otherwise the noise does nothing — and (b) still be weight-driven.
    // A weight-BLIND pick of 50 from the 475-doc raw pool overlaps the
    // argmax set hypergeometrically: E = 50·50/475 ≈ 5.3 docs. Measured
    // overlap on this corpus is 22 — pin ≥ 3× the blind expectation so
    // a weight-decoupling regression fails while honest sampling noise
    // (Gumbel σ ≈ 1.28e6 micro-nats vs a few-e6 score spread) passes.
    val argmax = SparkEntry.queries("q157_dsir_select")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val sampled = res.map(_.getLong(0)).toSet
    assert(sampled != argmax, "gumbel selection identical to argmax — noise inert")
    assert((sampled & argmax).size >= 16,
      s"only ${(sampled & argmax).size}/${Dsir.SelectK} of the argmax set survived — " +
        "~3x the weight-blind expectation (5.3) is the floor; selection " +
        "no longer tracks the importance weights")
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
