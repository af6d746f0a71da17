package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.ColumnBridge.{column => asCol, expression => asExpr}

/** q223 behavior pins: hand-derived SimHashBits votes and foldFp folds
  * on fixtures, the fast-path ≡ contract-machinery differentials on the
  * real corpus (the equalities q223's xx_consistent column ships to the
  * driver), and the gate's own invariants (sample rule, 48-bit range,
  * two rows per sampled doc, all-consistent).
  */
class SignatureContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def simhashBits(c: org.apache.spark.sql.Column, w: Int) =
    asCol(graft.expressions.SimHashBits(asExpr(c), w))

  test("SimHashBits: hand-computed votes, tie bits drop to 0, empty array is 0") {
    // hashes 0b101, 0b011 at width 3: bit0 votes +2 -> 1; bit1 votes
    // 0 (tie, NOT set); bit2 votes 0 (tie) -> sig = 1
    val r = Seq((Seq(5L, 3L), Seq.empty[Long]))
      .toDF("hs", "empty")
      .select(simhashBits(col("hs"), 3).as("s"),
        simhashBits(col("empty"), 3).as("e"))
      .head()
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 0L)
    // a single hash sets exactly its own bits (every vote is +1/-1)
    val one = Seq(Seq(0xA5L)).toDF("hs")
      .select(simhashBits(col("hs"), 8)).head().getLong(0)
    assert(one == 0xA5L)
  }

  test("SimHashBits: a null element is skipped, never voted as hash 0") {
    // [0xA5, null] must equal [0xA5] alone — ArrayData.getLong on a null
    // slot silently reads 0, which would down-vote every bit (r19
    // ADVICE latent case). array(h, null-long) types as
    // array<bigint, containsNull=true>.
    val withNull = Seq(0xA5L).toDF("h")
      .select(simhashBits(array(col("h"),
        lit(null).cast("long")), 8).as("s"))
      .head().getLong(0)
    assert(withNull == 0xA5L, "null element must not skew the vote")
  }

  test("foldFp: hand fold, negative hashes pmod'd into range") {
    val p = graft.functions.TextFunctions.FoldPrime
    val hs = Seq(7L, -3L, 123456789L)
    val expected = hs.foldLeft(0L)((acc, h) =>
      (acc * 31 + java.lang.Math.floorMod(h, p)) % p)
    val got = Seq(hs).toDF("hs")
      .select(graft.functions.TextFunctions.foldFp(col("hs"))).head().getLong(0)
    assert(got == expected)
    // empty input folds to the initial accumulator
    assert(Seq(Seq.empty[Long]).toDF("hs")
      .select(graft.functions.TextFunctions.foldFp(col("hs"))).head().getLong(0) == 0L)
  }

  test("fast paths equal the contract machinery on the whole corpus (not just the sample)") {
    import graft.functions.TextFunctions.{fingerprint, foldFp, tokens}
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
    val xxhs = transform(col("toks"), w => xxhash64(w))
    val diverged = docs.select(
        (ops.Dedup.simhash(col("toks")) === simhashBits(xxhs, 64)).as("sig_ok"),
        (fingerprint(col("text")) === foldFp(xxhs)).as("fp_ok"))
      .filter(!col("sig_ok") || !col("fp_ok")).count()
    assert(diverged == 0L,
      "single-pass SimHash / inline-hash fingerprint diverged from the " +
        "composed SimHashBits/foldFp machinery the q223 oracle validates")
  }

  test("q223: sample rule replayed, two rows per doc, 48-bit sigs, all consistent") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q223_signature_contract")(spark, d).collect()
    val sampled = Tables.documents(spark, d)
      .filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) === "0")
      .count()
    assert(sampled > 0, "fixture must sample at least one doc")
    assert(rows.length == 2 * sampled)
    assert(rows.map(_.getString(0)).distinct.sorted.toSeq ==
      Seq("q24_fingerprint_fold48", "q28_simhash48"))
    rows.foreach { r =>
      val sig = r.getLong(3)
      assert(sig >= 0L, s"negative sig for ${r.getString(0)}/${r.getLong(1)}")
      if (r.getString(0) == "q28_simhash48")
        assert(sig < (1L << 48), "simhash48 must stay inside 48 bits")
      else
        assert(sig < graft.functions.TextFunctions.FoldPrime,
          "fold must stay inside the modulus")
      assert(r.getBoolean(4), "xx_consistent must hold on every sampled doc")
    }
  }
}
