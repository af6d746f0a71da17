package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ClusterOps, EmbeddingOps}

/** q150 signed random projection: the oracle hash proves the signed sums
  * are bit-exact; this spec proves the projection is USEFUL — the
  * Johnson–Lindenstrauss property (pairwise distances survive the 64→16
  * cut up to bounded distortion), which is the reason an index would
  * store the sketch at all.
  */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private lazy val orig: Map[Long, Array[Long]] =
    ClusterOps.quantized(Tables.embeddings(spark, d))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  private lazy val proj: Map[Long, Array[Long]] =
    SparkEntry.queries("q150_random_projection")(spark, d)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getLong(2))
      }

  test("q150 matches a direct driver-side recomputation (engine ≡ formula)") {
    orig.keys.toSeq.sorted.take(5).foreach { id =>
      val v = orig(id)
      val expect = (0 until EmbeddingOps.ProjDim).map { j =>
        v.indices.map(i => EmbeddingOps.projSign(i, j) * v(i)).sum
      }
      assert(proj(id).toSeq == expect, s"projection mismatch for vec $id")
    }
  }

  test("q150 JL property: pairwise distances preserved up to bounded distortion") {
    def d2(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(30)
    val pairs = for { i <- ids.indices; j <- i + 1 until ids.length }
      yield (ids(i), ids(j))
    val m = EmbeddingOps.ProjDim.toDouble
    val ratios = pairs.map { case (a, b) =>
      d2(proj(a), proj(b)) / (m * d2(orig(a), orig(b)))
    }
    val mean = ratios.sum / ratios.length
    val within2x = ratios.count(r => r > 0.5 && r < 2.0).toDouble / ratios.length
    // Pearson correlation between original and projected squared distances
    val xs = pairs.map { case (a, b) => d2(orig(a), orig(b)) }
    val ys = pairs.map { case (a, b) => d2(proj(a), proj(b)) }
    def corr(x: Seq[Double], y: Seq[Double]): Double = {
      val mx = x.sum / x.length; val my = y.sum / y.length
      val cov = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
      val sx = math.sqrt(x.map(a => (a - mx) * (a - mx)).sum)
      val sy = math.sqrt(y.map(b => (b - my) * (b - my)).sum)
      cov / (sx * sy)
    }
    val c = corr(xs, ys)
    info(f"mean distance ratio (proj / m·orig): $mean%.3f; within [0.5,2): ${within2x * 100}%.0f%%; corr $c%.3f")
    // E[‖Pv‖²] = m·‖v‖² for ±1 entries; sd of the ratio ≈ √(2/m) ≈ 0.35
    // at m=16. Gates pinned from measurement with margin: the product
    // seed reads 0.96/0.35 here where TRUE iid signs read 0.97/0.41 on
    // the same pairs (this corpus's pairwise distances are nearly
    // uniform, so ratio-level correlation is noise-bounded ~0.4 even
    // for a perfect matrix — the within-2× mass is the separating
    // metric: the rejected linear-seed LCG variants read 55-64%).
    assert(mean > 0.8 && mean < 1.25, f"mean ratio $mean%.3f outside unbiasedness band")
    assert(within2x >= 0.85, f"only ${within2x * 100}%.0f%% of pairs within 2x distortion")
    assert(c >= 0.2, f"distance correlation $c%.3f too weak for a useful sketch")
  }
}
