package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q202 behavior pins: a driver brute-force replay of the whole
  * scoring (epoch days, cents, three quartile ranks, segment fold)
  * and the population laws on the corpus.
  */
class RfmSegmentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q202: segments equal a driver brute force") {
    val sf = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        expr("datediff(to_date(o_orderdate), DATE '1970-01-01')").cast("long"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val perCust = orders.groupBy(_._1).toSeq.map { case (c, os) =>
      (c, os.map(_._2).max, os.size.toLong, os.map(_._3).sum)
    }
    val refDay = perCust.map(_._2).max
    val n = perCust.size.toLong
    def scores(key: (Long, Long, Long, Long) => (Long, Long)): Map[Long, Long] =
      perCust.sortBy(p => key(p._1, refDay - p._2, p._3, p._4))
        .zipWithIndex.map { case (p, i) => p._1 -> (i.toLong * 4 / n + 1) }.toMap
    val r = scores((c, rec, _, _) => (-rec, c))
    val f = scores((c, _, fr, _) => (fr, c))
    val m = scores((c, _, _, ce) => (ce, c))
    val expected = perCust.groupBy(p => r(p._1) * 100 + f(p._1) * 10 + m(p._1))
      .toSeq.sortBy(_._1).map { case (seg, ps) =>
        (seg, ps.size.toLong, ps.map(_._3).sum, ps.map(_._4).sum)
      }
    val got = SparkEntry.queries("q202_rfm_segments")(spark, sf).collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3))).toSeq
    assert(got == expected, s"engine:\n${got.mkString("\n")}\nexpected:\n${expected.mkString("\n")}")
  }

  test("q202: segment codes are valid and the population conserves") {
    val rows = SparkEntry.queries("q202_rfm_segments")(spark, "/root/testdata/sf0.01")
      .collect()
    val nCust = Tables.orders(spark, "/root/testdata/sf0.01")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    for (r <- rows) {
      val seg = r.getLong(0)
      val (rs, fs, ms) = (seg / 100, seg / 10 % 10, seg % 10)
      assert(Seq(rs, fs, ms).forall(x => x >= 1 && x <= 4), s"bad segment $seg")
    }
    // each quartile dimension splits the population into near-equal fourths
    val byR = rows.groupBy(_.getLong(0) / 100).view.mapValues(_.map(_.getLong(1)).sum)
    assert(byR.values.max - byR.values.min <= 1, byR.toMap.toString)
  }
}
