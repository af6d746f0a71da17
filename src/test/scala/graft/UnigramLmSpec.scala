package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.UnigramLm

/** q156 unigram-LM tokenizer: the oracle hash proves engine ≡ SQL
  * replay; this spec proves the Viterbi core matches the TEXTBOOK
  * dynamic program — brute-force enumeration of every segmentation on
  * adversarial overlap fixtures, the tie-break pinned by hand, and the
  * end-to-end training run checked for totality (the LmTokenizerSpec
  * discipline applied to the top-down family).
  */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Every segmentation of `w` into vocab pieces (≤ MaxPiece chars). */
  private def allSegs(w: String, vocab: Set[String]): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(4, w.length)).flatMap { l =>
      val p = w.substring(0, l)
      if (vocab(p)) allSegs(w.substring(l), vocab).map(p +: _) else Seq.empty
    }

  test("viterbi finds the max-score segmentation (brute-force cross-check on overlaps)") {
    // adversarial overlaps: 'aba'/'ab'/'ba' all pieces, so 'ababa' has
    // many competing parses whose scores genuinely differ
    val model = Map(
      "a" -> -3000000L, "b" -> -3100000L,
      "ab" -> -4000000L, "ba" -> -4100000L,
      "aba" -> -5000000L, "bab" -> -5200000L)
    for (w <- Seq("ababa", "aabba", "abab", "baab", "aaaa", "b")) {
      val got = UnigramLm.viterbi(w, model)
      assert(got.mkString("") == w, s"'$w': pieces must concatenate back")
      val best = allSegs(w, model.keySet).map(s => s.map(model).sum).max
      assert(got.map(model).sum == best,
        s"'$w': viterbi ${got.mkString("+")} scores ${got.map(model).sum}, brute-force max $best")
    }
  }

  test("score tie prefers the larger split point (shortest last piece) — the oracle's ORDER BY best DESC, ptr DESC") {
    // lp(ab) == lp(a)+lp(b): both parses of 'ab' score -20 exactly; the
    // DP at j=2 must pick i=1 (piece 'b') over i=0 (piece 'ab')
    val model = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L)
    assert(UnigramLm.viterbi("ab", model) == Seq("a", "b"))
    // and transitively on a longer tie chain
    assert(UnigramLm.viterbi("abab", model) == Seq("a", "b", "a", "b"))
    // but a genuinely cheaper multi-char piece still wins
    assert(UnigramLm.viterbi("ab", Map("a" -> -10L, "b" -> -10L, "ab" -> -19L))
      == Seq("ab"))
  }

  test("unsegmentable input fails loudly, never silently drops chars") {
    intercept[IllegalArgumentException] {
      UnigramLm.viterbi("az", Map("a" -> -1L)) // 'z' not in vocab
    }
  }

  test("end-to-end training: segmentation is total and self-consistent on the real corpus") {
    val rows = SparkEntry.queries("q156_unigram_lm_train")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // one output row per word TYPE, each segmented exactly back to itself
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    rows.foreach { r =>
      val (w, nPieces, seg) = (r.getString(0), r.getLong(2), r.getString(3))
      val pieces = seg.split(" ")
      assert(pieces.mkString("") == w, s"'$w' segmented to '$seg'")
      assert(pieces.length.toLong == nPieces)
      assert(pieces.forall(p => p.nonEmpty && p.length <= UnigramLm.MaxPiece))
    }
    // training compresses: multi-char pieces must actually get used
    // (pure char-fallback output would mean the EM learned nothing)
    assert(rows.exists(r => r.getString(3).split(" ").exists(_.length > 1)),
      "no multi-char piece in any segmentation — vocabulary unused")
  }

  test("q159 fertility report is consistent with the q156 segmentation it consumes") {
    val d = "/root/testdata/sf0.001"
    val fert = SparkEntry.queries("q159_tokenizer_fertility")(spark, d).collect()
    assert(fert.nonEmpty)
    fert.foreach { r =>
      val (nw, np) = (r.getLong(1), r.getLong(2))
      val (ppw, cpp) = (r.getDouble(3), r.getDouble(4))
      assert(np >= nw, "every word costs at least one piece")
      assert(ppw >= 1.0 && ppw <= UnigramLm.MaxWord)
      assert(cpp >= 1.0 && cpp <= UnigramLm.MaxPiece)
    }
    // the two consumers share one model: total pieces from the
    // per-source report must equal the q156 per-type segmentation
    // re-weighted by its own corpus counts
    val seg = SparkEntry.queries("q156_unigram_lm_train")(spark, d).collect()
    val totalFromTypes = seg.map(r => r.getLong(1) * r.getLong(2)).sum
    val totalFromReport = fert.map(_.getLong(2)).sum
    assert(totalFromReport == totalFromTypes,
      s"report total $totalFromReport != type-weighted total $totalFromTypes")
  }
}
