package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EpochAllocation

/** q173 behavior pins: the closed-form prefix allocation equals the
  * textbook ITERATIVE water-filling fixed point on skewed fixtures, the
  * fixed-point laws hold on the corpus output (caps respected, budget
  * conserved up to truncation), and the redistribution story is real
  * (capping a small source raises the big sources' epochs).
  */
class EpochAllocationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(src: Seq[(String, Long)]): Map[String, (Long, Int, Long, Long)] =
    EpochAllocation.allocate(src.toDF("source", "n")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(3), r.getLong(4), r.getLong(5)))).toMap

  /** Textbook iterative water-filling: repeat {proportional fill; cap
    * violators} until stable; final proportional fill over survivors. */
  private def iterative(src: Seq[(String, Long)]): Map[String, Long] = {
    val w = src.map { case (s, n) => s -> math.sqrt(n.toDouble).toLong }.toMap
    val cap = src.map { case (s, n) => s -> n * EpochAllocation.EMax }.toMap
    val b = src.map(_._2).sum * EpochAllocation.BudgetMult
    var capped = Set.empty[String]
    var changed = true
    while (changed) {
      val r = b - capped.toSeq.map(cap).sum
      val wu = src.collect { case (s, _) if !capped(s) => w(s) }.sum
      val newly = src.collect {
        case (s, _) if !capped(s) && w(s) * r > cap(s) * wu => s
      }
      changed = newly.nonEmpty
      capped ++= newly
    }
    val r = b - capped.toSeq.map(cap).sum
    val wu = src.collect { case (s, _) if !capped(s) => w(s) }.sum
    src.map { case (s, _) =>
      s -> (if (capped(s)) cap(s) else r * w(s) / wu)
    }.toMap
  }

  test("q173: skewed fixture — small sources cap, mass flows to the big one") {
    val src = Seq(("tiny", 100L), ("mid", 10000L), ("big", 1000000L))
    val got = run(src)
    assert(got("tiny")._2 == 1 && got("tiny")._3 == 400L,
      s"tiny must cap at 4 epochs: ${got("tiny")}")
    assert(got("mid")._2 == 1 && got("mid")._3 == 40000L)
    assert(got("big")._2 == 0, "big source must stay uncapped")
    // redistribution: with no caps, big's temperature share would be
    // B·w/W = 3030300·1000/1110 → 2.73 epochs; the capped sources give
    // their excess back, lifting big to (B − 40400)/n = 2.9899 epochs
    val noCapShare = 3030300L * 1000L / 1110L * 1000000L / 1000000L
    assert(got("big")._3 > noCapShare, s"big alloc ${got("big")._3} !> $noCapShare")
    assert(got("big")._4 == 2989900L, s"big epochs_u ${got("big")._4}")
    assert(got.map(_._2._3).sum <= src.map(_._2).sum * EpochAllocation.BudgetMult)
  }

  test("q173: closed form equals the iterative fixed point on varied fixtures") {
    val fixtures = Seq(
      Seq(("a", 100L), ("b", 10000L), ("c", 1000000L)),
      Seq(("a", 50L), ("b", 60L), ("c", 70L), ("d", 80L)),       // all near-uniform
      Seq(("a", 1L), ("b", 4L), ("c", 1000000L)),                // extreme skew
      Seq(("a", 123L), ("b", 456L), ("c", 789L), ("d", 99999L), ("e", 31L)))
    fixtures.foreach { src =>
      val got = run(src).map { case (s, v) => s -> v._3 }
      val exp = iterative(src)
      assert(got == exp, s"fixture $src: closed $got vs iterative $exp")
    }
  }

  test("q173: corpus output satisfies the fixed-point laws") {
    val rows = SparkEntry.queries("q173_epoch_allocation")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val b = rows.map(_._2).sum * EpochAllocation.BudgetMult
    rows.foreach { case (s, n, capped, alloc) =>
      assert(alloc <= n * EpochAllocation.EMax, s"$s exceeds the epoch cap")
      if (capped == 1) assert(alloc == n * EpochAllocation.EMax)
    }
    val spent = rows.map(_._4).sum
    assert(spent <= b, "allocation overspends the budget")
    // truncating fills lose < 1 token per weight unit of the uncapped pool
    val anyUncapped = rows.exists(_._3 == 0)
    if (anyUncapped)
      assert(b - spent <= rows.map(r => math.sqrt(r._2.toDouble).toLong).sum,
        s"unallocated ${b - spent} exceeds the truncation bound")
  }
}
