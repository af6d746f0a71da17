package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MRL mergeable-quantile pins: exactness below one buffer, the
  * self-certified rank bound under FORCED merge trees (different
  * repartitionings must all stay inside each run's own tolerance), and
  * the q220 gate rows for q226.
  */
class MrlSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val qs = Seq(0.25, 0.5, 0.75)

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int = 64): (Seq[Double], Long, Long) = {
    val r = df.agg(graft.functions.MrlSketch(k, qs)(col("v"))).head()
    val row = r.getStruct(0)
    (row.getSeq[Double](0), row.getLong(1), row.getLong(2))
  }

  test("below one buffer the sketch is exact: cuts are true order statistics, tol = 1") {
    val vals = (1 to 40).map(_.toDouble)
    val (cuts, n, tol) = sketch(vals.toDF("v").repartition(1), k = 64)
    assert(n == 40L && tol == 1L, "no compaction => err 0, maxWeight 1")
    // cut(q) = first value whose rank reaches q*n: 10, 20, 30
    assert(cuts == Seq(10.0, 20.0, 30.0))
  }

  test("the self-certified bound holds under every forced merge tree") {
    // adversarial-ish data: heavy ties + a skewed tail
    val vals = ((1 to 20000).map(i => (i % 97).toDouble) ++
      (1 to 5000).map(i => 1000.0 + i)).toSeq
    val sorted = vals.sorted
    for (parts <- Seq(1, 7, 32)) {
      val (cuts, n, tol) = sketch(vals.toDF("v").repartition(parts), k = 512)
      assert(n == vals.size.toLong)
      // theory: tol ~ n·levels/k = 25000·~6/512 ≈ 300 (~1% of n)
      assert(tol < n / 20, s"tolerance should stay ~1% scale at k=512, got $tol of $n")
      qs.zip(cuts).foreach { case (q, cut) =>
        val target = q * n
        val cntLt = sorted.count(_ < cut).toDouble
        val cntLe = sorted.count(_ <= cut).toDouble
        assert(cntLt <= target + tol + 1 && cntLe >= target - tol - 1,
          s"parts=$parts q=$q cut=$cut rank window [$cntLt,$cntLe] " +
            s"outside target $target +- ${tol + 1}")
      }
    }
  }

  test("merge accounting: tolerance adds across slices and the bound still holds") {
    val a = (1 to 3000).map(_.toDouble)
    val all = a ++ a.map(_ + 3000)
    // one sketch over the concatenation vs Spark merging two natural slices
    val (cuts, n, tol) = sketch(all.toDF("v").repartition(2))
    assert(n == 6000L)
    val sorted = all.sorted
    qs.zip(cuts).foreach { case (q, cut) =>
      val target = q * n
      assert(sorted.count(_ < cut) <= target + tol + 1)
      assert(sorted.count(_ <= cut) >= target - tol - 1)
    }
  }

  test("q226 presents 9 rows; q220 carries its gate rows with within TRUE") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q226_mrl_quantiles")(spark, d).collect()
    assert(rows.length == 9, "3 returnflags x 3 quantiles")
    assert(rows.forall(_.getAs[Long]("tol") > 0))
    val gate = SparkEntry.queries("q220_sketch_error_report")(spark, d)
      .filter(col("sketch") === "q226_mrl_k1024").collect()
    assert(gate.length == 9)
    gate.foreach(r => assert(r.getAs[Boolean]("within"),
      s"MRL gate tripped: ${r.getAs[String]("item")}"))
  }

  test("q228: two independently built half sketches merge inside the merged tolerance") {
    val d = "/root/testdata/sf0.001"
    val merged = ops.SketchReport.mrlMergedHalves(spark, d).collect()
    assert(merged.length == 3, "one merged sketch per returnflag")
    // records conservation: the merged n must equal the full lineitem
    // count per returnflag — a dropped half would silently shrink it
    val exact = graft.Tables.lineitem(spark, d)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { r =>
      assert(r.getAs[Long]("records") == exact(r.getAs[String]("grp")),
        s"merged record count drifted for ${r.getAs[String]("grp")}")
    }
    // and the registered gate holds
    val gate = SparkEntry.queries("q228_mrl_merge_gate")(spark, d).collect()
    assert(gate.length == 9)
    gate.foreach(r => assert(r.getAs[Boolean]("within"),
      s"merged-sketch gate tripped: ${r.getAs[String]("item")}"))
  }
}
