package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ExactSubstr

/** q171 behavior pins: planted shared substrings are found with the
  * right length and positions, sub-threshold runs stay silent, and on
  * the real corpus every reported (pair, position, length) is VERBATIM
  * true — the canon characters actually match, so a hash collision
  * inflating a run would fail here, not just in theory.
  */
class ExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9]", "")

  // md5 split rule: ids 3 and 5 are test; 0, 1, 8 are train
  private def leaks(docs: Seq[(Long, String)]) = {
    val df = docs.map { case (id, t) => (id, t, "en", "t", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    ExactSubstr.substringLeaks(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
  }

  test("q171: a planted 30-char shared run is found with exact length and positions") {
    // shared canon run: "thequickbrownfoxjumpsoverthela" (30 chars)
    val shared = "the quick brown fox jumps over the la"
    assert(canon(shared).length == 30)
    val got = leaks(Seq(
      3L -> s"held out benchmark text $shared end of test doc padding words",
      0L -> s"training document begins $shared and then continues differently",
      1L -> "completely unrelated training text with no shared characters at all"))
    assert(got.keySet == Set((0L, 3L)), s"pairs: ${got.keySet}")
    val (len, pr, pt, islands) = got((0L, 3L))
    assert(len == 30, s"longest_len $len != 30")
    assert(islands == 1L)
    // canon("training document begins ") = 23 chars -> run starts at 24
    assert(pr == canon("training document begins ").length + 1, s"train_pos $pr")
    assert(pt == canon("held out benchmark text ").length + 1, s"test_pos $pt")
  }

  test("q171: a sub-threshold 12-char run is not reported; two separated runs count as islands") {
    val small = "short shared"                     // canon 11 chars < 16
    assert(canon(small).length == 11)
    val runA = "first planted contamination run"   // 28 canon chars
    val runB = "second stolen evaluation answer"   // 29 canon chars
    val got = leaks(Seq(
      3L -> s"test doc with $runA then its own words then $runB tail",
      5L -> s"another test doc containing only $small here",
      0L -> s"train doc quoting $runA middle filler text $runB closing",
      1L -> s"train doc that echoes just $small nothing else in common"))
    assert(!got.contains((1L, 5L)), "11-char run must stay below the 16 threshold")
    assert(got.contains((0L, 3L)))
    val (len, _, _, islands) = got((0L, 3L))
    assert(islands == 2L, s"expected two islands, got $islands")
    // boundary canon chars differ on every side (h|g before runA, t|m
    // after it, r|e before runB, t|c after), so neither run extends
    assert(len == math.max(canon(runA).length, canon(runB).length),
      s"longest $len != ${math.max(canon(runA).length, canon(runB).length)}")
  }

  test("q174: a passage copied between two docs reports once, canonicalized a < b") {
    val passage = "this exact paragraph was syndicated into both articles"
    val df = Seq(
      (8L, s"first article intro $passage and a unique ending"),
      (1L, s"totally different opener $passage with another close"),
      (0L, "an article sharing nothing with the other two at all"))
      .map { case (id, t) => (id, t, "en", "t", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = ops.ExactSubstr.duplicatePassages(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set((1L, 8L)), s"pairs: ${got.keySet}")
    val (len, pa, pb) = got((1L, 8L))
    assert(len == canon(passage).length, s"len $len != ${canon(passage).length}")
    assert(pa == canon("totally different opener ").length + 1)
    assert(pb == canon("first article intro ").length + 1)
  }

  test("q174: every reported corpus passage is verbatim-true at its reported positions") {
    val d = "/root/testdata/sf0.001"
    val texts = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> canon(r.getString(1)).take(ops.Winnowing.MaxCanon)).toMap
    val rows = SparkEntry.queries("q174_duplicate_passages")(spark, d).collect()
    assert(rows.nonEmpty, "corpus must exercise repeated passages")
    rows.foreach { r =>
      val (a, b, len, pa, pb) = (r.getLong(0), r.getLong(1),
        r.getLong(2).toInt, r.getLong(3).toInt, r.getLong(4).toInt)
      assert(a < b, "pairs must canonicalize a < b")
      val sa = texts(a).slice(pa - 1, pa - 1 + len)
      val sb = texts(b).slice(pb - 1, pb - 1 + len)
      assert(sa.length == len && sa == sb,
        s"pair ($a,$b): reported $len-char passage at ($pa,$pb) is not verbatim")
    }
  }

  test("q171: every reported corpus leak is verbatim-true at its reported position") {
    val d = "/root/testdata/sf0.001"
    val texts = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> canon(r.getString(1)).take(ops.Winnowing.MaxCanon)).toMap
    val rows = SparkEntry.queries("q171_decontaminate_substring")(spark, d).collect()
    assert(rows.nonEmpty, "corpus must exercise substring leaks")
    rows.foreach { r =>
      val (tr, te, len, pr, pt) =
        (r.getLong(0), r.getLong(1), r.getLong(2).toInt,
          r.getLong(3).toInt, r.getLong(4).toInt)
      val a = texts(tr).slice(pr - 1, pr - 1 + len)
      val b = texts(te).slice(pt - 1, pt - 1 + len)
      assert(a.length == len && a == b,
        s"pair ($tr,$te): reported $len-char run at ($pr,$pt) is not verbatim")
    }
  }
}
