package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.NaiveBayes

/** q153 NB classifier: the oracle hash proves engine ≡ SQL replay; this
  * spec proves both match the TEXTBOOK algorithm — a hand-computed
  * separable fixture through the exact production path, plus sanity on
  * the real corpus run.
  */
class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("separable fixture: predictions match hand-computed multinomial NB") {
    import spark.implicits._
    // two clearly separable classes: 'cat' docs say cat, 'dog' docs say
    // dog; test docs repeat one word
    val docs = Seq(
      (1L, "cats", "train", "cat cat purr"),
      (2L, "cats", "train", "cat purr cat"),
      (3L, "dogs", "train", "dog bark dog"),
      (4L, "dogs", "train", "bark dog bark"),
      (10L, "cats", "test", "cat cat"),
      (11L, "dogs", "test", "dog bark"),
      (12L, "cats", "test", "purr"),
      (13L, "dogs", "test", "bark bark dog")
    ).toDF("doc_id", "source", "split", "text")
    val out = NaiveBayes.classifierOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
    assert(out(10L)._1 == "cats" && out(10L)._2)
    assert(out(11L)._1 == "dogs" && out(11L)._2)
    assert(out(12L)._1 == "cats" && out(12L)._2)
    assert(out(13L)._1 == "dogs" && out(13L)._2)
    // hand-check doc 10 ("cat cat"): vocab = {cat, purr, dog, bark},
    // V=4; cats: tot=6, c(cat)=4 → w_cat = ln(5/10); dogs: tot=6,
    // c(cat)=0 → w = ln(1/10). score(cats) − score(dogs) =
    // 2·(ln(0.5) − ln(0.1))·10⁶ ≈ 3218876 micro-nats (priors equal).
    val margin = NaiveBayes.classifierOn(docs).collect()
      .find(_.getLong(0) == 10L).get.getLong(4)
    val expect = 2 * (math.round(math.log(0.5) * 1e6) - math.round(math.log(0.1) * 1e6))
    assert(margin == expect, s"doc 10 margin $margin != hand-computed $expect")
  }

  test("real corpus: one prediction per test doc, margins positive") {
    val rows = SparkEntry.queries("q153_nb_source_classifier")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "exactly one prediction per doc")
    rows.foreach(r => assert(r.getLong(4) >= 0, "argmax margin must be >= 0"))
  }
}
