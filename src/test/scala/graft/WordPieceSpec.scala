package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.WordPiece

/** q161 WordPiece training + q162 greedy encode: the oracle hash proves
  * engine ≡ SQL replay; this spec proves both match the TEXTBOOK
  * algorithm — a scalar likelihood-score trainer (ratio argmax, ##
  * continuation, leftmost-greedy rewrite) run against the exact
  * production path on adversarial fixtures AND the real corpus, plus
  * the measured ULP-boundary gate the micro-nat quantization claim
  * rests on (the q154 discipline), and the BERT greedy-encode rules
  * ([UNK] whole-word fallback, longest-match-first) pinned by hand.
  */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // UTF-8 byte order — the engine's and oracle's shared tie-break
  // convention (see LmTokenizerSpec for why Scala String order differs)
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  private def codePoints(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** round HALF_UP away from zero — Spark round / DuckDB ROUND (scores
    * here are negative, where Math.round's half-toward-+inf differs).
    */
  private def quantHalfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Textbook WordPiece trainer: scalar while-loop, ## continuation
    * split, per-round unit + pair counts, argmax of the quantized
    * likelihood score with (score desc, pair asc UTF-8) tie-break,
    * leftmost-greedy rewrite. Also returns the min distance of any
    * candidate's raw score·10⁶ to a .5 rounding boundary — the measured
    * ULP-hazard margin for EVERY score the argmax ever compares.
    */
  private def refWordPiece(words: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, String, Long, Long)], Double) = {
    def split(w: String): Vector[String] =
      codePoints(w).zipWithIndex
        .map { case (c, i) => if (i == 0) c else "##" + c }
    var state: Map[String, Vector[String]] = words.keys.map(w => w -> split(w)).toMap
    var minMargin = Double.MaxValue
    val out = Seq.newBuilder[(Int, String, String, String, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairs = collection.mutable.Map.empty[(String, String), Long]
      val units = collection.mutable.Map.empty[String, Long]
      for ((w, syms) <- state) {
        for (s <- syms) units(s) = units.getOrElse(s, 0L) + words(w)
        for (i <- 0 until syms.length - 1)
          pairs((syms(i), syms(i + 1))) =
            pairs.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val scored = pairs.toSeq.map { case ((p1, p2), c) =>
          val raw = 1e6 * (math.log(c.toDouble) -
            math.log(units(p1).toDouble) - math.log(units(p2).toDouble))
          val margin = UlpBoundary.margin(raw)
          if (margin < minMargin) minMargin = margin
          (p1, p2, c, quantHalfUp(raw))
        }
        val best = scored.sortWith { (a, b) =>
          if (a._4 != b._4) a._4 > b._4
          else {
            val c = utf8Compare(a._1, b._1)
            if (c != 0) c < 0 else utf8Compare(a._2, b._2) < 0
          }
        }.head
        val (p1, p2, c, score) = best
        val merged = p1 + (if (p2.startsWith("##")) p2.substring(2) else p2)
        out += ((r, p1, p2, merged, c, score))
        state = state.map { case (w, syms) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == p1 && syms(i + 1) == p2) {
              b += merged; i += 2
            } else { b += syms(i); i += 1 }
          }
          w -> b.result()
        }
        r += 1
      }
    }
    (out.result(), minMargin)
  }

  private def runEngine(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, String, Long, Long)] = {
    import spark.implicits._
    val df = words.toSeq.toDF("word", "n")
    WordPiece.trainOn(df, rounds)._1.collect()
      .map(row => (row.getInt(0), row.getString(1), row.getString(2),
        row.getString(3), row.getLong(4), row.getLong(5))).toSeq
  }

  test("ratio argmax diverges from raw-count BPE where the textbook says it must") {
    // (a,##b) has cnt 10 but common units (score −ln10); (c,##d) has
    // cnt 3 with rare units (score −ln3) — WordPiece merges cd first,
    // raw-count BPE would merge ab. Hand-checked micro-nat scores.
    val words = Map("ab" -> 10L, "cd" -> 3L)
    val got = runEngine(words, 2)
    assert(got.map(m => (m._1, m._2, m._3, m._4)) ==
      Seq((1, "c", "##d", "cd"), (2, "a", "##b", "ab")))
    assert(got.head._6 == quantHalfUp(-1e6 * math.log(3.0)))
    assert(got(1)._6 == quantHalfUp(-1e6 * math.log(10.0)))
  }

  test("overlapping same-symbol runs merge leftmost-greedily under the ## algebra") {
    // 'b' weight pushes (b,##a) below (##a,##a): the picked pair has a
    // 3-position match run in b-aaaa; leftmost-greedy keeps offsets 0,2
    val words = Map("baaaa" -> 1L, "b" -> 50L)
    val (ref, _) = refWordPiece(words, 3)
    val got = runEngine(words, 3)
    assert(got == ref)
    assert(ref.head._2 == "##a" && ref.head._3 == "##a" && ref.head._4 == "##aa")
  }

  test("equal scores fall back to the (p1, p2) lexicographic tie-break") {
    val words = Map("ab" -> 2L, "cd" -> 2L)
    val got = runEngine(words, 1)
    assert(got.head._2 == "a" && got.head._3 == "##b")
  }

  test("real corpus: engine ≡ textbook trainer; scores clear the rounding boundary") {
    import graft.functions.TextFunctions.tokens
    val words = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")).between(1, WordPiece.MaxWord))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (ref, minMargin) = refWordPiece(words, WordPiece.Rounds)
    val got = SparkEntry.queries("q161_wordpiece_train")(spark, sf).collect()
      .map(row => (row.getInt(0), row.getString(1), row.getString(2),
        row.getString(3), row.getLong(4), row.getLong(5))).toSeq
    assert(got == ref)
    info(f"min distance of any candidate score·10⁶ to a .5 boundary: $minMargin%.2e")
    assert(minMargin > UlpBoundary.Floor,
      f"a merge score sits $minMargin%.2e from a rounding boundary — within " +
        "cross-libm drift; see the hazard note in WordPiece's scaladoc")
  }

  test("greedy encode: longest-match-first, ## continuation, whole-word [UNK]") {
    val vocab = Set("a", "##b", "ab", "##ab", "x")
    assert(WordPiece.greedyEncode("ab", vocab) == Some(Seq("ab")))
    assert(WordPiece.greedyEncode("aab", vocab) == Some(Seq("a", "##ab")))
    assert(WordPiece.greedyEncode("a", vocab) == Some(Seq("a")))
    // 'b' exists only as a continuation piece — word-initial b is UNK
    assert(WordPiece.greedyEncode("ba", vocab).isEmpty)
    // mid-word failure discards the partial segmentation (BERT rule)
    assert(WordPiece.greedyEncode("abz", vocab).isEmpty)
  }

  test("q162 on the real corpus: pieces in vocab, concatenation reconstructs, UNK exercised") {
    val vocab = WordPiece.trainedVocab(spark, sf)
    val rows = SparkEntry.queries("q162_wordpiece_encode")(spark, sf).collect()
    assert(rows.nonEmpty)
    var unks = 0
    rows.foreach { r =>
      val (w, nWp, seg) = (r.getString(0), r.getLong(2), r.getString(3))
      if (seg == "[UNK]") { unks += 1; assert(nWp == 1L) }
      else {
        val pieces = seg.split(" ").toSeq
        assert(pieces.length.toLong == nWp)
        assert(pieces.forall(vocab.contains), s"$w: piece outside vocab in $seg")
        assert(pieces.head == pieces.head.stripPrefix("##"),
          s"$w: word-initial piece must be unmarked")
        assert(pieces.tail.forall(_.startsWith("##")),
          s"$w: continuation pieces must be ##-marked")
        val rebuilt = pieces.head + pieces.tail.map(_.substring(2)).mkString
        assert(rebuilt == w, s"$w: segmentation rebuilds to $rebuilt")
      }
    }
    // part names contain characters the documents corpus never emits in
    // the matching position — the [UNK] path must actually fire
    assert(unks > 0, "expected at least one [UNK] on the OOV domain")
  }
}
