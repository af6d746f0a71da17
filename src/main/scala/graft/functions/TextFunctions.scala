package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale corpus pipelines:
  * tokenization, quality signals, language-ID votes, shingling,
  * fingerprinting. All column expressions (no UDFs) so they stay inside
  * Catalyst; the hash-based ops use `xxhash64` (partition-independent,
  * reproducible at any scale).
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish lexical token count: alpha runs, digit runs, or single
    * non-space symbols — the pre-tokenization regex family BPE vocabs use.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Fraction of characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") / length(text))

  /** Default stopword set: high-frequency function words. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stop: Seq[String] = Stopwords): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, w => w.isInCollection(stop))).cast("double") / size(t))
  }

  /** Fraction of distinct tokens (low → repetitive/spammy text). */
  def uniqueTokenRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      size(array_distinct(t)).cast("double") / size(t))
  }

  /** Composite quality score in [0,1]: length saturation, non-stopword
    * mass, vocabulary diversity. Fixed evaluation order so the double
    * arithmetic is reproducible cross-engine.
    */
  def qualityScore(text: Column): Column =
    lit(0.4) * least(lit(1.0), size(tokens(text)).cast("double") / 100.0) +
      lit(0.3) * (lit(1.0) - stopwordRatio(text)) +
      lit(0.3) * uniqueTokenRatio(text)

  /** Language marker words (synthetic corpus vocabulary; the operator
    * semantics — per-language token votes + deterministic argmax — is
    * what a real n-gram langid does).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "fr" -> Seq("table", "row", "column"),
    "es" -> Seq("data", "query", "scan"),
    "de" -> Seq("group", "order", "sort"),
    "zh" -> Seq("hash", "join", "merge"))

  /** Marker-vote count for one language. */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), w => w.isInCollection(markers)))

  /** Word n-gram shingles (distinct, first-occurrence order), empty
    * array for short docs. Native single-pass expression.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(graft.expressions.WordShingles(expression(tokens(text)), n))
  }

  /** Ordered word n-grams WITH duplicates (the multiset form —
    * repetition signals need occurrence counts, where [[shingles]]'
    * distinct form answers set membership). Native single-pass
    * expression; empty array for sub-n-token docs.
    */
  def ngrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(graft.expressions.WordShingles(expression(tokens(text)), n, distinct = false))
  }

  /** HOF reference formulation of [[shingles]] (for differential tests). */
  def shinglesHof(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Order-sensitive rolling document fingerprint:
    * fp = fold(acc·31 + h(token)) mod p — modular so it never overflows
    * under ANSI arithmetic (acc < p ≈ 2³¹, so acc·31 + h stays far below
    * Long.Max). Cheap change-detection fingerprint; NOT portable SQL
    * (xxhash64), so rows-only checked.
    */
  def fingerprint(text: Column): Column = {
    val p = FoldPrime
    aggregate(tokens(text), lit(0L), (acc, w) =>
      pmod(acc * 31L + pmod(xxhash64(w), lit(p)), lit(p)))
  }

  /** Modulus shared by [[fingerprint]] and [[foldFp]] — a prime just
    * below 2³¹, so acc·31 + h stays far below Long.Max under ANSI
    * arithmetic and the fold never overflows.
    */
  private[graft] val FoldPrime = 2038074743L

  /** [[fingerprint]]'s rolling fold factored over PRE-HASHED tokens
    * (array<long>): fold(acc·31 + (h mod p)) mod p. The generic form a
    * DuckDB oracle replays with portable hashes (q223's md5-48
    * contract) and q223's consistency column compares against the
    * inline-xxhash64 registered form — the bridge that upgrades q24's
    * rows-only fingerprint from spec-gated to driver-hash-gated.
    * pmod(h, p) handles negative hashes (xxhash64); nonneg hashes pass
    * through unchanged, matching plain `%` in the oracle.
    */
  def foldFp(hashes: Column): Column =
    aggregate(hashes, lit(0L), (acc, h) =>
      pmod(acc * 31L + pmod(h, lit(FoldPrime)), lit(FoldPrime)))
}
