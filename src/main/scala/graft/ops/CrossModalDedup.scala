package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q225: CROSS-MODAL DEDUP AGREEMENT — joins the visual near-dup pair
  * graph (q221's perceptual dHash pigeonhole pairs) with the text
  * near-dup pair graph (q26's exact-Jaccard pairs) over the image-doc
  * universe, and classifies every pair by which modality flagged it:
  *
  *   - `both`        — image AND text near-dups: true re-encodes/mirrors.
  *   - `visual_only` — near-duplicate IMAGES carrying DIFFERENT text:
  *     the caption-farm signal (one asset re-captioned many times — the
  *     pairs a text-only dedup pass is blind to, and exactly what a
  *     multimodal curation pass exists to catch).
  *   - `text_only`   — near-duplicate text with visually distinct
  *     media: boilerplate/template text around different assets.
  *
  * The r18 verdict's optional headroom item #6, done as a composition
  * of two STORED pair artifacts: [[ImageHash.dhashPairs]] (FrameMemo,
  * shared with q221) and [[Dedup.jaccardPairs]] (FrameMemo, shared with
  * q26/q47/q218) — the registered query is a pair-frame full-outer
  * join + a 3-row spine aggregate; nothing corpus-scale runs per call.
  * The text side is restricted to pairs whose BOTH docs are image docs
  * (doc_id % 3 < 2, the asMedia container assignment), so the two
  * graphs classify the same universe.
  *
  * Fully oracle-replayed: the visual side is the q221 contract chain
  * ([[ImageHash.dhashPairCtes]] — same SQL definition, never a fork),
  * the text side is q26's pair CTEs ([[Dedup.PairCtes]]), composed in
  * one WITH. At 100 TB both pair graphs are stored edge lists and this
  * is a broadcast-free edge-list join — linear in the pair counts.
  */
object CrossModalDedup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q225_crossmodal_agreement" -> ((s, d) => {
      import s.implicits._
      val vis = ImageHash.dhashPairs(s, d)
        .select(col("doc_a"), col("doc_b"), lit(true).as("visual"))
      val txt = Dedup.jaccardPairs(s, d, threshold = 0.2)
        .filter(pmod(col("doc_a"), lit(3)) < 2 && pmod(col("doc_b"), lit(3)) < 2)
        .select(col("doc_a"), col("doc_b"), lit(true).as("textual"))
      val counts = vis.join(txt, Seq("doc_a", "doc_b"), "full_outer")
        .select(when(coalesce(col("visual"), lit(false)) &&
            coalesce(col("textual"), lit(false)), "both")
          .when(coalesce(col("visual"), lit(false)), "visual_only")
          .otherwise("text_only").as("class"))
        .groupBy("class").agg(count(lit(1)).as("n_pairs"))
      // literal spine: an empty class is a 0-row, never a dropped row
      // (the q180 convention — absence IS the finding)
      Seq("both", "text_only", "visual_only").toDF("class")
        .join(counts, Seq("class"), "left")
        .na.fill(0L, Seq("n_pairs"))
        .orderBy("class")
    }))

  val oracleSql: Map[String, String] = Map(
    "q225_crossmodal_agreement" ->
      s"""${ImageHash.dhashPairCtes},
         |${Dedup.PairCtes},
         |tpairs AS (
         |  SELECT doc_a, doc_b FROM pairs
         |  WHERE doc_a % 3 < 2 AND doc_b % 3 < 2
         |), u AS (
         |  SELECT v.doc_a IS NOT NULL AS visual,
         |         t.doc_a IS NOT NULL AS textual
         |  FROM vpairs v FULL JOIN tpairs t
         |    ON v.doc_a = t.doc_a AND v.doc_b = t.doc_b
         |), counts AS (
         |  SELECT CASE WHEN visual AND textual THEN 'both'
         |              WHEN visual THEN 'visual_only'
         |              ELSE 'text_only' END AS class,
         |         COUNT(*) AS n_pairs
         |  FROM u GROUP BY 1
         |)
         |SELECT s.class, COALESCE(c.n_pairs, 0) AS n_pairs
         |FROM (SELECT unnest(['both', 'text_only', 'visual_only']) AS class) s
         |LEFT JOIN counts c USING (class)
         |ORDER BY class""".stripMargin)

  val rowsOnly: Set[String] = Set.empty
}
