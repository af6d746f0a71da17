package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling/splitting for training-data pipelines: hash
  * the stable document id, never `rand()`. A hash split is (a)
  * reproducible run-over-run and cluster-over-cluster, (b) stable under
  * re-partitioning and retries (a `rand()` split re-rolls every task
  * retry), and (c) embarrassingly parallel — a narrow per-row filter
  * with no shuffle, the only split mechanism that survives 100 TB.
  * md5 (not xxhash64) so the assignment is portable SQL and the oracle
  * can replay it bit-for-bit.
  */
object Sampling {

  /** First `n` hex chars of md5 of the row id — uniform in [0, 16^n),
    * compared lexicographically (fixed-length lowercase hex, so string
    * order IS numeric order).
    */
  private[graft] def hexPrefix(id: Column, n: Int): Column =
    substring(md5(id.cast("string").cast("binary")), 1, n)

  /** THE split rule — q54's assignment, shared by every query that
    * composes with the split (q66's decontamination target, q100's
    * manifest) so a retuned rule can never diverge between them:
    * 12/16 train, 2/16 validation, 2/16 test on the first md5 hex char.
    */
  private[graft] def splitOf(id: Column): Column = {
    val h = hexPrefix(id, 1)
    when(h.isin("c", "d"), "validation")
      .when(h.isin("e", "f"), "test")
      .otherwise("train")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // train/validation/test split on the first md5 hex char of doc_id:
    // 12/16 train, 2/16 validation, 2/16 test. Per-(split, lang) counts
    // prove the split is language-independent (hash uniformity), the
    // aggregate is 3 x |langs| rows — the only shuffle is tiny.
    "q54_train_split" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("split", splitOf(col("doc_id")))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("split", "lang")
    }),

    // temperature-based source mixing (multinomial α = 0.5): per-source
    // keep rate sqrt(min_count / n_s) flattens the source distribution
    // toward the smallest source — the rebalancing step a multi-source
    // training mix runs before packing. The rates derive FROM the data
    // (one tiny aggregate, broadcast back); each doc's fate is then the
    // same narrow md5-threshold filter as q55, with the double rate
    // quantized to a 4-hex cutoff. Deterministic cross-engine: sqrt and
    // the division are IEEE correctly-rounded, floor/format are exact,
    // and the reported counts are integers.
    "q78_source_mixing" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_before"))
      val minN = counts.agg(min(col("n_before")).as("min_n"))
      val cuts = counts.crossJoin(broadcast(minN))
        .withColumn("rate", sqrt(col("min_n").cast("double") / col("n_before")))
        .withColumn("cut",
          when(floor(col("rate") * 65536.0) >= 65536L, lit("zzzz"))
            .otherwise(format_string("%04x",
              floor(col("rate") * 65536.0).cast("int"))))
      val kept = docs.join(broadcast(cuts.select("source", "cut")), Seq("source"))
        .filter(hexPrefix(col("doc_id"), 4) < col("cut"))
        .groupBy("source").agg(count(lit(1)).as("n_after"))
      cuts.select("source", "n_before", "rate")
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          round(col("rate"), 6).as("rate_r"))
        .orderBy("source")
    }),

    // stratified downsample: per-language hash-threshold filter that
    // rebalances the corpus mix — keep ~6% of the dominant language
    // (en), ~50% of everything else. Pure narrow filter (zero shuffle
    // beyond the presentation sort): each row's fate depends only on
    // its own bytes, so the plan is a scan + filter at any scale.
    "q55_stratified_sample" -> ((s, d) => {
      val cutoff = when(col("lang") === "en", "1000").otherwise("8000")
      Tables.documents(s, d)
        .filter(hexPrefix(col("doc_id"), 4) < cutoff)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q54_train_split" ->
      """SELECT split, lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM (
        |  SELECT lang, n_chars,
        |         CASE WHEN substr(md5(doc_id::VARCHAR), 1, 1) IN ('c','d') THEN 'validation'
        |              WHEN substr(md5(doc_id::VARCHAR), 1, 1) IN ('e','f') THEN 'test'
        |              ELSE 'train' END AS split
        |  FROM documents
        |)
        |GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin,

    "q78_source_mixing" ->
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS n_before FROM documents GROUP BY source
        |), m AS (
        |  SELECT MIN(n_before) AS min_n FROM counts
        |), cuts AS (
        |  SELECT source, n_before,
        |         sqrt(CAST(min_n AS DOUBLE) / n_before) AS rate,
        |         CASE WHEN floor(sqrt(CAST(min_n AS DOUBLE) / n_before) * 65536.0) >= 65536
        |              THEN 'zzzz'
        |              ELSE printf('%04x', CAST(floor(sqrt(CAST(min_n AS DOUBLE) / n_before) * 65536.0) AS INTEGER))
        |              END AS cut
        |  FROM counts, m
        |), kept AS (
        |  SELECT d.source, COUNT(*) AS n_after
        |  FROM documents d JOIN cuts c USING (source)
        |  WHERE substr(md5(d.doc_id::VARCHAR), 1, 4) < c.cut
        |  GROUP BY d.source
        |)
        |SELECT c.source, c.n_before, COALESCE(k.n_after, 0) AS n_after,
        |       ROUND(c.rate, 6) AS rate_r
        |FROM cuts c LEFT JOIN kept k USING (source)
        |ORDER BY c.source""".stripMargin,

    "q55_stratified_sample" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE substr(md5(doc_id::VARCHAR), 1, 4)
        |      < CASE WHEN lang = 'en' THEN '1000' ELSE '8000' END
        |ORDER BY doc_id""".stripMargin
  )

  val rowsOnly: Set[String] = Set.empty
}
