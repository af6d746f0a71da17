package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LinearProbe

/** q165/q166 behavior pins: engine GD ≡ a driver-side textbook scalar
  * replay (every round, every weight), the descent property (training
  * loss strictly falls), separation (the target label alone carries a
  * positive mean score), and the int64 overflow headroom the scaladoc
  * promises.
  */
class LinearProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val d = "/root/testdata/sf0.001"

  /** Driver-side replica: quantized rows collected once, GD replayed
    * with plain Long arithmetic (the LmTokenizerSpec discipline). */
  private lazy val rows: Array[(Array[Long], Long)] =
    Tables.embeddings(spark, d).collect().map { r =>
      val emb = r.getSeq[Float](1)
      val x = emb.map(v => math.round(v.toDouble * 1000.0)).toArray
      val y = if (r.getInt(2) == LinearProbe.TargetLabel) 1L else -1L
      (x, y)
    }

  private def replay: Seq[Array[Long]] = {
    val n = rows.length
    val div = 2L * n * 1000000L
    var w = Array.fill(LinearProbe.Dims)(0L)
    (1 to LinearProbe.Rounds).map { _ =>
      val g = Array.fill(LinearProbe.Dims)(0L)
      rows.foreach { case (x, y) =>
        val r = x.zip(w).map { case (a, b) => a * b }.sum - y * LinearProbe.YScale
        for (j <- 0 until LinearProbe.Dims) g(j) += x(j) * r
      }
      w = Array.tabulate(LinearProbe.Dims)(j => w(j) - g(j) / div)
      w
    }
  }

  test("q165 equals the textbook scalar GD replay for every round and weight") {
    val got = SparkEntry.queries("q165_linear_probe_train")(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val exp = replay
    assert(got.size == LinearProbe.Rounds * LinearProbe.Dims)
    for (r <- 1 to LinearProbe.Rounds; j <- 0 until LinearProbe.Dims)
      assert(got((r, j)) == exp(r - 1)(j), s"round $r weight $j diverged")
    assert(exp.last.exists(_ != 0L), "training must move the weights")
  }

  test("q165 descends: sum of squared residuals strictly falls across rounds") {
    val states = Array.fill(LinearProbe.Dims)(0L) +: replay
    val losses = states.map { w =>
      rows.map { case (x, y) =>
        val r = x.zip(w).map { case (a, b) => a * b }.sum - y * LinearProbe.YScale
        BigInt(r) * BigInt(r)
      }.sum
    }
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss must fall each round: $losses")
    }
  }

  test("q166 separation: the target label alone has a positive mean score, and it is the max") {
    val got = SparkEntry.queries("q166_probe_scores")(spark, d).collect()
      .map(r => r.getInt(0) -> (r.getLong(2).toDouble / r.getLong(1))).toMap
    val target = got(LinearProbe.TargetLabel)
    assert(target > 0, s"target mean score must be positive: $got")
    got.foreach { case (label, mean) =>
      if (label != LinearProbe.TargetLabel)
        assert(mean < 0, s"non-target label $label has non-negative mean $mean")
    }
  }

  test("q165 overflow headroom: max |gradient| stays 100x under Long.MaxValue") {
    val n = rows.length
    var maxAbs = BigInt(0)
    var w = Array.fill(LinearProbe.Dims)(0L)
    (1 to LinearProbe.Rounds).foreach { _ =>
      val g = Array.fill(LinearProbe.Dims)(BigInt(0))
      rows.foreach { case (x, y) =>
        val r = x.zip(w).map { case (a, b) => a * b }.sum - y * LinearProbe.YScale
        for (j <- 0 until LinearProbe.Dims) g(j) += BigInt(x(j)) * BigInt(r)
      }
      maxAbs = maxAbs.max(g.map(_.abs).max)
      w = Array.tabulate(LinearProbe.Dims)(j =>
        w(j) - (g(j) / BigInt(2L * n * 1000000L)).toLong)
    }
    assert(maxAbs * 100 < BigInt(Long.MaxValue),
      s"gradient magnitude $maxAbs leaves less than 100x headroom")
  }
}
