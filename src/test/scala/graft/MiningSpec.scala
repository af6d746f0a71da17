package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Mining

/** q158 hard-negative mining: the oracle hash proves engine ≡ SQL
  * replay; this spec proves the mining does its JOB — hand-computable
  * cosines through the exact production path, the margin semantics,
  * and the no-positive drop rule.
  */
class MiningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hand-computed fixture: hardness order, exact margins, no-positive anchors drop") {
    import spark.implicits._
    // anchor 0 (label 1) with one perfect positive (20) and four
    // different-label candidates at exactly-computable cosines
    // 1, 1/√2, 3/5, 0 → margins 0, 0.2929, 0.4, 1. Anchor 1 doubles as
    // the no-positive case (label 9, unique) AND a negative for 0.
    val e = Seq(
      (0L, Seq(1.0, 0.0), 1),
      (1L, Seq(3.0, 4.0), 9),   // anchor with NO same-label vector; cos 3/5 vs 0
      (20L, Seq(1.0, 0.0), 1),  // positive, cos 1 -> pos_cos = 1
      (30L, Seq(2.0, 0.0), 2),  // negative, cos 1      (margin 0: hardest)
      (31L, Seq(1.0, 1.0), 2),  // negative, cos 1/sqrt2 (margin 0.2929)
      (32L, Seq(0.0, 1.0), 2)   // negative, cos 0      (margin 1)
    ).toDF("vec_id", "v", "label")
    val rows = Mining.hardNegativesOn(e).collect()
    // anchor 1 has no positive: it must DROP, not emit null margins
    assert(rows.map(_.getLong(0)).distinct.toSeq == Seq(0L),
      s"only anchor 0 has a positive; got anchors ${rows.map(_.getLong(0)).distinct.mkString(",")}")
    val negs = rows.sortBy(_.getInt(2)).map(r =>
      (r.getLong(1), r.getInt(2), r.getDouble(4), r.getDouble(5)))
    // vec 20 (same label) must never appear as a negative
    assert(!negs.exists(_._1 == 20L), "a positive leaked into the negatives")
    assert(negs.map(_._1).toSeq == Seq(30L, 31L, 1L, 32L), s"hardness order wrong: ${negs.toSeq}")
    assert(negs.map(_._4).toSeq == Seq(0.0, 0.2929, 0.4, 1.0), s"margins wrong: ${negs.toSeq}")
    assert(negs.map(_._3).toSeq == Seq(1.0, 0.7071, 0.6, 0.0))
  }

  test("real corpus: <= NegK negatives per anchor, labels differ, ranks contiguous") {
    val rows = SparkEntry.queries("q158_hard_negatives")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(2)).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"anchor $q ranks $ranks not contiguous")
      assert(ranks.length <= Mining.NegK)
    }
    // hardness must be real: somewhere a negative outranks the best
    // positive (margin <= 0) OR all margins positive but bounded — pin
    // only the invariant: margin = pos_cos - neg_cos implies rank-1
    // negatives have the smallest margin per anchor
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getInt(2)).map(_.getDouble(5)).toSeq
      assert(byRank == byRank.sorted, s"anchor $q margins not monotone: $byRank")
    }
  }
}
