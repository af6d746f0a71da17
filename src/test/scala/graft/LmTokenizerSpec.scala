package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q134 bigram perplexity + q135 BPE training: both checked against
  * independent brute-force scalar references (the window-algebra merge
  * must equal the textbook while-loop merge on every word), plus
  * adversarial overlap fixtures for the leftmost-greedy rule the window
  * parity trick implements.
  */
class LmTokenizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // textbook BPE reference: scalar while-loop merge, overlapping pair
  // counts, (count desc, pair asc) tie-break. Splits by CODE POINT and
  // tie-breaks in UTF-8 byte order — the engine's and oracle's shared
  // conventions (Scala's default String ordering is UTF-16 code-unit
  // order, which DISAGREES with both on non-BMP: U+1D11E sorts before
  // U+FB00 in UTF-16 but after it in UTF-8/code-point order).
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
  private implicit val utf8PairOrd: Ordering[(String, String)] =
    (p: (String, String), q: (String, String)) => {
      val c = utf8Compare(p._1, q._1)
      if (c != 0) c else utf8Compare(p._2, q._2)
    }
  private def codePoints(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  private def refBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var state: Map[String, Vector[String]] =
      words.keys.map(w => w -> codePoints(w)).toMap
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- state; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      if (counts.nonEmpty) {
        val mx = counts.values.max
        val (p1, p2) = counts.filter(_._2 == mx).keys.toSeq.sorted(utf8PairOrd).head
        out += ((r, p1, p2, mx))
        state = state.map { case (w, syms) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
              b += syms(i) + syms(i + 1); i += 2
            } else { b += syms(i); i += 1 }
          }
          w -> b.result()
        }
      }
    }
    out.result()
  }

  private def runBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    val df = words.toSeq.toDF("word", "n")
    ops.LmTokenizer.bpeTrainOn(df, rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
  }

  test("q135 merge algebra equals the textbook loop on overlap fixtures") {
    // aaaa: leftmost-greedy (a,a) merges positions 0 and 2, count 3
    // (overlapping occurrences all counted); round 2 merges (aa,aa)
    val fixtures = Seq(
      Map("aaaa" -> 1L),
      Map("aaa" -> 2L, "aab" -> 3L, "baa" -> 1L),
      Map("abab" -> 5L, "bab" -> 2L),
      Map("xyzzy" -> 7L, "zzz" -> 4L, "yy" -> 1L),
      Map("ab" -> 1L) // exhausts after 1 merge; trainer must stop cleanly
    )
    fixtures.foreach { f =>
      assert(runBpe(f, 4) == refBpe(f, 4), s"fixture $f")
    }
  }

  private def runBpeBatched(words: Map[String, Long], rounds: Int,
                            batch: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    val df = words.toSeq.toDF("word", "n")
    ops.LmTokenizer.bpeTrainOnBatched(df, rounds, batch)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
  }

  test("q140 batched merges equal sequential rounds on adversarial fixtures") {
    val fixtures = Seq(
      // fully disjoint pair space: the batch really fires (3 merges, 1 round)
      Map("ab" -> 10L, "cd" -> 8L, "ef" -> 6L),
      // chained overlap: (a,b) then (ab,c)-style cascades must serialize
      Map("abc" -> 9L, "bcd" -> 7L, "cde" -> 5L),
      // same-symbol runs: (a,a) creates (aa,a)/(aa,aa) pairs bounded by
      // its own count — must end its batch
      Map("aaaa" -> 6L, "bcbc" -> 5L, "dd" -> 4L),
      // exact count ties across interacting pairs: the strict-cstop
      // guard must fall back rather than guess
      Map("ab" -> 5L, "ac" -> 5L, "bc" -> 5L),
      // the real adversary for naive batching: a pair the batch's first
      // merge CREATES ((w,xy) via (w,x)) outranks the would-be second pick
      Map("wxy" -> 8L, "uv" -> 6L, "wx" -> 3L)
    )
    for (f <- fixtures; batch <- Seq(2, 3, 4, 8)) {
      assert(runBpeBatched(f, 6, batch) == refBpe(f, 6),
        s"fixture $f batch=$batch diverged from sequential")
    }
  }

  test("batched segmentation STATE equals sequential (the q136 fast path)") {
    import spark.implicits._
    // q136 segments through the batched iterator — equality must hold
    // for the full (word, pos, sym) state, not just the merge table
    val fixtures = Seq(
      Map("ab" -> 10L, "cd" -> 8L, "ef" -> 6L),
      Map("aaaa" -> 6L, "bcbc" -> 5L, "dd" -> 4L),
      Map("abc" -> 9L, "bcd" -> 7L, "cde" -> 5L))
    for (f <- fixtures) {
      val df = f.toSeq.toDF("word", "n")
      def segs(batch: Int) =
        ops.LmTokenizer.bpeSegments(df, 6, batch)
          .collect().map(r => (r.getString(0), r.getInt(2), r.getString(3)))
          .sortBy(s => (s._1, s._2)).toSeq
      assert(segs(4) == segs(1), s"fixture $f: batched state diverged")
    }
  }

  test("q140 batched equals sequential on RANDOM vocabularies") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // 3-letter alphabet: enough symbol diversity that batches of size >1
    // actually form, while {a,b} collisions keep the overlap guard busy
    val vocabGen = Gen.chooseNum(1, 6).flatMap { nw =>
      Gen.listOfN(nw, for {
        len <- Gen.chooseNum(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
        n <- Gen.chooseNum(1L, 9L)
      } yield (cs.mkString, n))
    }
    val prop = Prop.forAll(vocabGen) { raw =>
      val words = raw.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      runBpeBatched(words, 4, 3) == refBpe(words, 4)
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(r.passed, s"random-vocab batched property: $r")
  }

  test("selectBatch guards: overlap stop, tie fallback, same-symbol stop, window bound") {
    import ops.LmTokenizer.selectBatch
    val W = ops.LmTokenizer.BpeBatchWindow
    // overlap stops the scan; the survivor is strictly above the stop count
    assert(selectBatch(Seq(("a", "b", 10L), ("b", "c", 8L), ("d", "e", 7L)), W, 4)
      == Seq(("a", "b", 10L)))
    // a tie between a pick and the overlapping stop candidate must fall
    // back to the bare argmax (a created pair could tie and win the lex break)
    assert(selectBatch(Seq(("a", "b", 10L), ("c", "d", 10L), ("d", "x", 10L)), W, 4)
      == Seq(("a", "b", 10L)))
    // same-symbol pair ends its batch even with disjoint pairs below
    assert(selectBatch(Seq(("a", "a", 10L), ("c", "d", 8L), ("e", "f", 7L)), W, 4)
      == Seq(("a", "a", 10L)))
    // fully disjoint, table exhausted below the window: take them all
    assert(selectBatch(Seq(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L)), W, 4)
      == Seq(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L)))
    // a FULL window means hidden rows may tie the last count: drop picks at it
    assert(selectBatch(Seq(("a", "b", 10L), ("c", "d", 9L)), 2, 4)
      == Seq(("a", "b", 10L)))
    // maxBatch truncation keeps the strict guard against the next candidate
    assert(selectBatch(Seq(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 9L)), W, 2)
      == Seq(("a", "b", 10L)))
  }

  test("q140 on the real corpus equals q135 row for row") {
    // multi-merge rounds firing is pinned by the disjoint fixture above
    // (3 merges, 1 round); here the full corpus pipeline must agree
    val seqTable = SparkEntry.queries("q135_bpe_train")(spark, sf).collect()
    val batTable = SparkEntry.queries("q140_bpe_train_batched")(spark, sf).collect()
    assert(seqTable.map(_.toSeq).toSeq == batTable.map(_.toSeq).toSeq,
      "batched trainer diverged from the sequential trainer on the corpus")
  }

  // textbook APPLY reference: replay an ordered merge list
  // leftmost-greedily over a word's code points
  private def refApply(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = codePoints(word)
    merges.foreach { case (p1, p2) =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
          b += syms(i) + syms(i + 1); i += 2
        } else { b += syms(i); i += 1 }
      }
      syms = b.result()
    }
    syms
  }

  test("applyGroups serializes produce/consume chains, batches disjoint merges") {
    import ops.LmTokenizer.applyGroups
    // (ab,c) consumes what (a,b) produces — must start a new pass;
    // (d,e) interacts with neither and rides the second pass
    assert(applyGroups(Seq(("a", "b"), ("ab", "c"), ("d", "e")))
      == Seq(Seq(("a", "b")), Seq(("ab", "c"), ("d", "e"))))
    // shared match symbol splits
    assert(applyGroups(Seq(("a", "b"), ("b", "c")))
      == Seq(Seq(("a", "b")), Seq(("b", "c"))))
    // a merge PRODUCING a symbol a later merge produces-or-consumes splits
    assert(applyGroups(Seq(("a", "b"), ("c", "ab")))
      == Seq(Seq(("a", "b")), Seq(("c", "ab"))))
    // fully disjoint: one pass
    assert(applyGroups(Seq(("a", "b"), ("c", "d"), ("e", "f")))
      == Seq(Seq(("a", "b"), ("c", "d"), ("e", "f"))))
  }

  test("q141 replay equals the textbook apply loop, including true OOV words") {
    import spark.implicits._
    // chained merges + a same-symbol merge + a pair that never fires
    val merges = Seq(("a", "b"), ("ab", "c"), ("d", "d"), ("x", "y"))
    val words = Map("abcabc" -> 3L, "dddd" -> 2L, "abd" -> 1L,
      "zzz" -> 4L, "cab" -> 1L)
    val out = ops.LmTokenizer.bpeReplay(words.toSeq.toDF("word", "n"), merges)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getString(3)))).toMap
    words.keys.foreach { w =>
      val exp = refApply(w, merges)
      assert(out(w) == ((exp.length.toLong, exp.mkString("|"))),
        s"word $w: ${out(w)} vs $exp")
    }
  }

  test("q141 on the real tables matches scalar train+apply end to end") {
    val trainWords = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = refBpe(trainWords, ops.LmTokenizer.BpeRounds)
      .map { case (_, p1, p2, _) => (p1, p2) }
    val partWords = Tables.part(spark, sf)
      .select(explode(split(trim(col("p_name")), "\\s+")).as("w"))
      .collect().map(_.getString(0))
    val freq = partWords.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q141_bpe_apply_oov")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got.keySet == freq.keySet)
    freq.foreach { case (w, n) =>
      val exp = refApply(w, merges)
      assert(got(w) == ((n, exp.length.toLong, exp.mkString("|"))),
        s"word $w: ${got(w)} vs ($n, ${exp.length}, ${exp.mkString("|")})")
    }
    // the point of the query: the OOV domain really is OOV
    assert(freq.keySet.exists(w => !trainWords.contains(w)),
      "part vocabulary overlaps documents entirely — fixture lost its meaning")
  }

  test("q135 splits by code point and tie-breaks in UTF-8 order on non-ASCII words") {
    // 𝄞 is U+1D11E (non-BMP): a UTF-16 code-unit split would shatter it
    // into two lone surrogates, and UTF-16 ordering would sort it BEFORE
    // ﬀ (U+FB00) while UTF-8/code-point order sorts it after. The equal-
    // count pairs (a,ﬀ) and (a,𝄞) force the tie-break through exactly
    // that divergence; 日本語 pins multi-byte BMP splitting.
    val fixtures = Seq(
      Map("aﬀ" -> 3L, "a𝄞" -> 3L), // tie: UTF-8 picks (a,ﬀ)
      Map("𝄞𝄞a" -> 4L),       // non-BMP same-symbol run
      Map("héhé" -> 3L, "日本語" -> 2L, "語語語" -> 5L)
    )
    fixtures.foreach { f =>
      assert(runBpe(f, 4) == refBpe(f, 4), s"fixture $f")
    }
    // the tie really resolves to the UTF-8-smaller pair
    val tie = runBpe(Map("aﬀ" -> 3L, "a𝄞" -> 3L), 1)
    assert(tie.head._3 == "ﬀ",
      s"tie-break picked ${tie.head._3}: want U+FB00 (UTF-8 order), not U+1D11E (UTF-16 order)")
  }

  test("q135 merge algebra equals the textbook loop on RANDOM vocabularies") {
    // raw ScalaCheck (the scalatestplus bridge isn't on the offline
    // classpath): alphabet {a,b} maximizes same-symbol runs — the
    // leftmost-greedy parity cases fixtures can miss. Few cases × few
    // rounds: each case runs real Spark jobs.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vocabGen = Gen.chooseNum(1, 5).flatMap { nw =>
      Gen.listOfN(nw, for {
        len <- Gen.chooseNum(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
        n <- Gen.chooseNum(1L, 9L)
      } yield (cs.mkString, n))
    }
    val prop = Prop.forAll(vocabGen) { raw =>
      val words = raw.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      runBpe(words, 3) == refBpe(words, 3)
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(r.passed, s"random-vocab property: $r")
  }

  test("q135 on the real corpus equals the brute-force reference") {
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q135_bpe_train")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    assert(got == refBpe(words, ops.LmTokenizer.BpeRounds))
    // merged column is always p1 || p2
    SparkEntry.queries("q135_bpe_train")(spark, sf).collect().foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
    }
  }

  test("q136 encode equals segmenting every word with the textbook loop") {
    // replay the reference merges, then segment and count per doc
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val words = docs.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    var state: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    refBpe(words, ops.LmTokenizer.BpeRounds).foreach { case (_, p1, p2, _) =>
      state = state.map { case (w, syms) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
            b += syms(i) + syms(i + 1); i += 2
          } else { b += syms(i); i += 1 }
        }
        w -> b.result()
      }
    }
    val got = SparkEntry.queries("q136_bpe_encode")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, toks) =>
      val exp = (toks.length.toLong, toks.map(w => state(w).length.toLong).sum)
      assert(got(id) == exp, s"doc $id: ${got(id)} vs $exp")
    }
    // BPE after 10 merges must strictly compress vs characters and never
    // beat whitespace tokens
    docs.foreach { case (id, toks) =>
      val chars = toks.map(_.length.toLong).sum
      assert(got(id)._2 < chars && got(id)._2 >= toks.length.toLong)
    }
  }

  test("q134 equals a brute-force bigram LM on the real corpus") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val c1 = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c12 = docs.values.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = c1.size
    val got = SparkEntry.queries("q134_bigram_perplexity")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val expected = docs.collect { case (id, t) if t.length >= 2 =>
      val terms = t.zip(t.drop(1)).map { bg =>
        -math.log((c12(bg) + 1).toDouble / (c1(bg._1) + v))
      }
      id -> ((t.length - 1L, terms.sum / terms.length))
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (nb, avg)) =>
      val (gnb, gavg, gppl) = got(id)
      assert(gnb == nb, s"doc $id n_bigrams")
      assert(math.abs(gavg - avg) < 1e-5, s"doc $id avg_nll $gavg vs $avg")
      assert(math.abs(gppl - math.exp(avg)) < 1e-3, s"doc $id ppl")
    }
  }

  test("the BPE oracle chain survives early exhaustion (LEFT JOIN pin)") {
    // a CROSS JOIN against an empty per-round best annihilates the state
    // chain in DuckDB when training exhausts before BpeRounds (validated
    // on an 'ab'-only corpus: cross join -> 0 oracle rows vs a correct
    // engine result). The generated SQL must keep the carry-forward join.
    Seq("q135_bpe_train", "q136_bpe_encode").foreach { q =>
      val sql = SparkEntry.oracleSql(q)
      assert(sql.contains("LEFT JOIN b"), s"$q oracle lost the carry-forward join")
      assert(!sql.contains("CROSS JOIN b"), s"$q oracle regressed to CROSS JOIN")
    }
  }

  test("q134 scoring is a per-doc average of positive NLL terms") {
    val df = SparkEntry.queries("q134_bigram_perplexity")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0) // -ln(p) with p<1 smoothed
      assert(r.getDouble(3) > 1.0) // ppl = exp(avg_nll)
    }
  }
}
