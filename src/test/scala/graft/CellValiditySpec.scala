package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.PqOps

/** q194 behavior pins: translation invariance of the scatter identity
  * (offset grid ≡ raw grid), a brute-force per-cell replay, and the
  * separation property on the corpus (pooled within < total scatter —
  * the cells actually explain structure).
  */
class CellValiditySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q194: per-cell scatter equals a brute force on BOTH the offset and raw grids") {
    val sf = "/root/testdata/sf0.001"
    val cells = PqOps.residCodes(spark, sf).select("vec_id", "coarse").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qs = PqOps.quantizedPts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    def withinOf(vs: Seq[Seq[Long]]): Long = {
      val n = vs.size.toLong
      val t2 = vs.map(_.map(x => x * x).sum).sum
      val dims = vs.head.indices.map(j => vs.map(_(j)).sum)
      n * t2 - dims.map(sj => sj * sj).sum
    }
    val byCell = qs.toSeq.groupBy { case (v, _) => cells(v) }
    val got = SparkEntry.queries("q194_cell_validity")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    for ((cell, vs) <- byCell) {
      val pts = vs.map(_._2)
      val w = withinOf(pts)
      val wRaw = withinOf(pts.map(_.map(_ - 1024L))) // offset removed
      assert(w == wRaw, s"scatter identity not translation-invariant in cell $cell")
      val n = pts.size.toLong
      assert(got(cell) == ((n, w, w * 1000L / n, 2 * w / (n * n))), s"cell $cell")
    }
    val all = qs.values.toSeq
    assert(got(-1)._2 == withinOf(all), "global scatter")
  }

  test("q194: cells explain structure — pooled within sits below total scatter") {
    val rows = SparkEntry.queries("q194_cell_validity")(spark, "/root/testdata/sf0.01")
      .collect()
    val g = rows.filter(_.getInt(0) == -1).head
    val cellsRows = rows.filter(_.getInt(0) >= 0)
    assert(cellsRows.length == 16, s"${cellsRows.length} cells")
    // pooled WSS (exact integer sum of wss_milli) vs total mean scatter
    // (g.wss_milli): within-fraction strictly < 1, and every share is
    // a valid ppm
    val pooled = cellsRows.map(_.getLong(3)).sum
    assert(pooled < g.getLong(3), s"pooled $pooled !< total ${g.getLong(3)}")
    for (r <- cellsRows) {
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L, r.toString)
    }
    assert(g.getLong(5) == 1000000L)
  }
}
