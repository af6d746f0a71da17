package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ops.ClassifierEval

/** q178 behavior pins: exact hand-computed PRF on a known confusion
  * (incl. a never-predicted-support-0 class and the zero-denominator
  * conventions), and a driver-side brute-force replay of the report
  * from q153's actual predictions on the corpus.
  */
class ClassifierEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq

  test("q178: hand-computed confusion incl. a never-actual class") {
    // (actual, predicted): A->A x3, A->B, A->D, B->B x2, B->C, C->C, C->A.
    // A: tp3 fp1 fn2; B: tp2 fp1 fn1; C: tp1 fp1 fn1;
    // D: never actual — tp0 fp1 fn0, support 0, all rates 0 by convention.
    // micro: 6/10 correct; macro: integer means over 4 classes.
    val preds = (Seq.fill(3)(("A", "A")) ++ Seq(("A", "B"), ("A", "D")) ++
      Seq.fill(2)(("B", "B")) ++ Seq(("B", "C"), ("C", "C"), ("C", "A")))
      .toDF("actual", "predicted")
    assert(rows(ClassifierEval.reportOn(preds)) == Seq(
      ("A", 3L, 1L, 2L, 5L, 750000L, 600000L, 666666L),
      ("B", 2L, 1L, 1L, 3L, 666666L, 666666L, 666666L),
      ("C", 1L, 1L, 1L, 2L, 500000L, 500000L, 500000L),
      ("D", 0L, 1L, 0L, 0L, 0L, 0L, 0L),
      ("__macro__", 6L, 4L, 4L, 10L, 479166L, 441666L, 458333L),
      ("__micro__", 6L, 4L, 4L, 10L, 600000L, 600000L, 600000L)))
  }

  test("q178: corpus report equals a brute-force replay of q153's predictions") {
    val sf = "/root/testdata/sf0.001"
    val preds = SparkEntry.queries("q153_nb_source_classifier")(spark, sf)
      .select("actual", "predicted").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val classes = (preds.map(_._1) ++ preds.map(_._2)).distinct.sorted
    def ppm(num: Long, den: Long) = if (den == 0) 0L else num * 1000000L / den
    val perClass = classes.map { c =>
      val tp = preds.count(p => p._1 == c && p._2 == c).toLong
      val fp = preds.count(p => p._1 != c && p._2 == c).toLong
      val fn = preds.count(p => p._1 == c && p._2 != c).toLong
      (c, tp, fp, fn, tp + fn, ppm(tp, tp + fp), ppm(tp, tp + fn),
        ppm(2 * tp, 2 * tp + fp + fn))
    }
    val tp = perClass.map(_._2).sum
    val fp = perClass.map(_._3).sum
    val fn = perClass.map(_._4).sum
    val n = preds.size.toLong
    val k = classes.size.toLong
    val expected = (perClass ++ Seq(
      ("__macro__", tp, fp, fn, tp + fn, perClass.map(_._6).sum / k,
        perClass.map(_._7).sum / k, perClass.map(_._8).sum / k),
      ("__micro__", tp, fp, fp, n, ppm(tp, n), ppm(tp, n), ppm(tp, n))))
      .sortBy(_._1)
    val got = rows(SparkEntry.queries("q178_classifier_eval")(spark, sf))
    assert(got == expected, s"engine:\n${got.mkString("\n")}\nexpected:\n${expected.mkString("\n")}")
    // the eval must actually separate: the classifier beats chance on
    // this separable-by-construction corpus
    val micro = got.find(_._1 == "__micro__").get
    assert(micro._6 > 1000000L / k, "micro accuracy at or below chance")
  }

  test("q185: textbook kappa fixture and the kappa = -1 sign path") {
    // classic 2x2: (A,A)=20 (A,B)=5 (B,A)=10 (B,B)=15 -> n=50, po=0.7,
    // rows 25/25, cols 30/20, S=1250, pe=0.5, kappa=0.4
    val preds = (Seq.fill(20)(("A", "A")) ++ Seq.fill(5)(("A", "B")) ++
      Seq.fill(10)(("B", "A")) ++ Seq.fill(15)(("B", "B")))
      .toDF("actual", "predicted")
    val r = ClassifierEval.agreementOn(preds).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((50L, 35L, 700000L, 500000L, 400000L)))
    // perfect 2-class disagreement: kappa must be exactly -1
    val bad = (Seq.fill(3)(("A", "B")) ++ Seq.fill(3)(("B", "A")))
      .toDF("actual", "predicted")
    val rb = ClassifierEval.agreementOn(bad).head()
    assert(rb.getLong(2) == 0L && rb.getLong(4) == -1000000L, rb.toString)
  }

  test("q185: corpus stats consistent with q178's micro row and brute force") {
    val sf = "/root/testdata/sf0.001"
    val preds = SparkEntry.queries("q153_nb_source_classifier")(spark, sf)
      .select("actual", "predicted").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val n = preds.size.toLong
    val c = preds.count(p => p._1 == p._2).toLong
    val rows = preds.groupBy(_._1).map { case (l, o) => l -> o.size.toLong }
    val cols = preds.groupBy(_._2).map { case (l, o) => l -> o.size.toLong }
    // .toSeq first: mapping over the key SET would collapse duplicate
    // products before the sum
    val s = rows.keys.toSeq.map(l => rows(l) * cols.getOrElse(l, 0L)).sum
    // HALF_UP (away from zero), matching the engines' ROUND on signed doubles
    val kappa = new java.math.BigDecimal(
      (n * c - s).toDouble * 1000000.0 / (n * n - s).toDouble)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val r = SparkEntry.queries("q185_agreement_stats")(spark, sf).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((n, c, c * 1000000L / n, s * 1000000L / (n * n), kappa)))
    // po must equal q178's micro precision on the same predictions
    val micro = SparkEntry.queries("q178_classifier_eval")(spark, sf)
      .filter(col("label") === "__micro__").head()
    assert(r.getLong(2) == micro.getLong(5), "po must equal micro accuracy")
    // chance correction must bite: kappa strictly below po on this corpus
    assert(r.getLong(4) < r.getLong(2))
  }
}
