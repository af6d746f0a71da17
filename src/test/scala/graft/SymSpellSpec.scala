package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SymSpell

/** q164 behavior pins: each Levenshtein-1 edit class by hand, the
  * transposition non-match, deterministic tie-breaks, the code-point
  * deletion neighborhood on non-BMP input, and the SymSpell recall
  * argument (deletion-key candidates ⊇ all distance-1 pairs) against a
  * driver-side brute-force sweep of the real corpus.
  */
class SymSpellSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Code-point Levenshtein — the textbook DP, independent of both
    * engines (Java String ops would miscount non-BMP). */
  private def lev(a: String, b: String): Int = {
    val (x, y) = (a.codePoints.toArray, b.codePoints.toArray)
    val d = Array.tabulate(x.length + 1)(i => Array.tabulate(y.length + 1) {
      j => if (i == 0) j else if (j == 0) i else 0
    })
    for (i <- 1 to x.length; j <- 1 to y.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    d(x.length)(y.length)
  }

  test("q164 correct(): each edit class lands; transposition stays null; ties break by freq then word") {
    val canon = Seq(
      ("energy", 50L), ("power", 40L),
      // tie pair for "gril_": both distance 1, equal freq -> lexicographic
      ("grill", 7L), ("grile", 7L),
      // freq tie-break target: "wagon" outranks "wagos" despite both d=1
      ("wagon", 30L), ("wagos", 5L)).toDF("word", "n")
    val noisy = Seq(
      "energgy",  // insertion wrt canon (delete one g to reach energy)
      "enery",    // deletion
      "energi",   // substitution
      "eenrgy",   // transposition: plain Levenshtein 2 -> no suggestion
      "grile",    // equals a canon word? no: 'grile' IS canon -> use gril
      "grill",    // identity is NOT a correction (d=0 filtered by =1)
      "wagot"     // d=1 from both wagon(30) and wagos(5) -> wagon
    ).toSeq.map(Tuple1(_)).toDF("word")
    val got = SymSpell.correct(noisy, canon).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("energgy") == Some("energy"))
    assert(got("enery") == Some("energy"))
    assert(got("energi") == Some("energy"))
    assert(got("eenrgy") == None, "transposition is distance 2 under plain Levenshtein")
    assert(got("wagot") == Some("wagon"), "frequency must dominate the tie-break")
    // 'grill' and 'grile' are both canon AND queried: each is d=1 from
    // the other, so the corrector offers the sibling — identity (d=0)
    // must never surface as a suggestion
    assert(got("grill") == Some("grile"))
    assert(got("grile") == Some("grill"))
  }

  test("q164 delKeys: code-point neighborhood incl. non-BMP; dedup of repeated-char deletions") {
    val r = Seq("a𝄞b", "aab").toDF("word")
      .select(col("word"), SymSpell.delKeys(col("word")).as("ks"))
      .collect().map(x => x.getString(0) -> x.getSeq[String](1).toList).toMap
    assert(r("a𝄞b") ==
      List("a𝄞b", "𝄞b", "ab", "a𝄞"),
      "the surrogate pair must delete as ONE unit")
    assert(r("aab") == List("aab", "ab", "aa"),
      "adjacent equal-char deletions must collapse to one key")
  }

  test("q164 corrupt(): engine position matches a driver md5 replay; result is distance 1") {
    val words = Seq("customer", "energy", "lineitem").toDF("word")
    val got = words.select(col("word"), SymSpell.corrupt(col("word")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (w, c) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(4)
        .foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      val p = (md % w.length).toInt // ascii: code points = chars
      assert(c == w.substring(0, p) + w.substring(p + 1), s"$w -> $c, expected pos $p")
      assert(lev(w, c) == 1)
    }
  }

  test("q164 recall: deletion-key candidates reproduce the brute-force distance-1 sweep") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q164_symspell_correct")(spark, d).collect()
    assert(rows.nonEmpty, "corpus run must produce corrections")
    // driver-side semantics: vocabulary + corrupted queries recomputed
    // from the raw corpus, full cross product under textbook Levenshtein
    val freq = Tables.documents(spark, d)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val canon = freq.filter(_._2 >= SymSpell.CanonMinFreq)
    val noisy = rows.map(_.getString(0)).toSet
    val expected = noisy.map { q =>
      val hits = canon.filter { case (c, _) => lev(q, c) == 1 }
      q -> (if (hits.isEmpty) None
            else Some(hits.minBy { case (c, n) => (-n, c) }))
    }.toMap
    rows.foreach { r =>
      val (q, got) = (r.getString(0),
        Option(r.getString(1)).map(s => (s, r.getLong(2))))
      assert(got == expected(q), s"$q: engine $got vs brute-force ${expected(q)}")
    }
  }
}
