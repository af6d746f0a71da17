package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q167 behavior pins: NTILE tercile geometry per language, bucket
  * order consistency with the integer rank key, and the q154-class
  * ULP-boundary gate over every distinct bigram's quantized NLL at the
  * oracle SF.
  */
class QualityBucketsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val rows =
    SparkEntry.queries("q167_ccnet_buckets")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getString(4)))

  test("q167: per-language tercile sizes differ by at most one, remainder to head") {
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      val sizes = docs.groupBy(_._4).view.mapValues(_.length).toMap
      val (h, m, t) = (sizes.getOrElse("head", 0),
        sizes.getOrElse("middle", 0), sizes.getOrElse("tail", 0))
      assert(h + m + t == docs.length)
      assert(h >= m && m >= t && h - t <= 1,
        s"$lang tercile sizes $h/$m/$t violate NTILE geometry")
    }
  }

  test("q167: bucket boundaries respect the integer rank key per language") {
    val ord = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      // sorted by (key, doc_id) the bucket sequence must be monotone
      val seq = docs.sortBy(d => (d._3, d._1)).map(d => ord(d._4))
      seq.sliding(2).foreach { case Array(a, b) =>
        assert(a <= b, s"$lang: bucket order regressed along the rank key")
      }
      // and perplexity separates: head's mean key strictly below tail's
      val mean = docs.groupBy(_._4).view
        .mapValues(ds => ds.map(_._3.toDouble).sum / ds.length).toMap
      assert(mean("head") < mean("tail"),
        s"$lang: head mean NLL ${mean("head")} !< tail ${mean("tail")}")
    }
  }

  test("q167: no bigram micro-nat NLL sits near a .5 rounding boundary (q154-class gate)") {
    // the quantized value is 1e6·ln((c12+1)/(c1+V)) per DISTINCT bigram;
    // cross-libm drift is ~1e-10 in these units — every value on the
    // ORACLE-SF corpus must clear a .5 boundary by far more. If this
    // fires after a corpus change, the diagnosis is the documented
    // hazard at QualityBuckets, not an engine bug.
    val d = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d)
    val t = graft.functions.TextFunctions.tokens(col("text"))
    val bi = docs.select(explode(arrays_zip(
        slice(t, lit(1), size(t) - 1).as("w1"),
        slice(t, lit(2), size(t) - 1).as("w2"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = docs.select(explode(t).as("w1")).groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = uni.count()
    val pairs = c12.join(uni, Seq("w1"))
      .select(col("c12"), col("c1")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val minMargin = UlpBoundary.minMargin(pairs.iterator.map { case (n12, n1) =>
      1e6 * math.log((n12 + 1).toDouble / (n1 + v)) })
    info(f"min distance of any bigram NLL·1e6 to a .5 boundary: $minMargin%.2e")
    assert(minMargin > UlpBoundary.Floor,
      f"a bigram NLL sits $minMargin%.2e from a rounding boundary — see the hazard note")
  }
}
