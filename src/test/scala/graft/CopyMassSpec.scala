package graft

import org.scalatest.funsuite.AnyFunSuite

/** q197 behavior pins: the asymmetry on a planted subset-mirror
  * fixture (the small source reads 1e6 ppm toward the big one, not
  * vice versa), and a driver brute-force corpus replay.
  */
class CopyMassSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def grams5(t: String): Seq[String] = {
    val w = t.trim.split("\\s+").toSeq
    if (w.size >= 5) w.sliding(5).map(_.mkString(" ")).toSeq else Seq.empty
  }

  test("q197: a subset mirror reads 1e6 ppm in ITS row only") {
    val dir = "/tmp/graft_test_copymass"
    // BIG: 10 tokens -> 6 grams; SUB: copies BIG's first 6 tokens
    // (2 grams, both inside BIG); SUB's row toward BIG = 1e6 ppm,
    // BIG's row toward SUB = 2 of 6 grams' mass.
    val big = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val sub = "t1 t2 t3 t4 t5 t6"
    Seq((0L, big, "en", "BIG", 0L), (1L, sub, "en", "SUB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q197_copy_mass_matrix")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("BIG", "SUB", 6L, 2L, 2L, 2L * 1000000L / 6L),
      ("SUB", "BIG", 2L, 2L, 2L, 1000000L)), got.mkString(", "))
  }

  test("q197: corpus matrix equals a string-multiset brute force") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val counts: Map[String, Map[String, Long]] = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(d => grams5(d._2)).groupBy(identity)
        .map { case (g, v) => g -> v.size.toLong }
    }
    val srcs = counts.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a != b
      inter = counts(a).keySet & counts(b).keySet if inter.nonEmpty
    } yield {
      val total = counts(a).values.sum
      val mass = inter.toSeq.map(counts(a)).sum
      (a, b, total, mass, inter.size.toLong, mass * 1000000L / total)
    }).toSeq
    val got = SparkEntry.queries("q197_copy_mass_matrix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"engine ${got.size} rows vs expected ${expected.size}")
    assert(got.nonEmpty)
  }
}
