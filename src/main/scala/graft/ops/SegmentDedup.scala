package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens

/** Sub-document dedup and the dedup lifecycle: segment-level (C4-style
  * "line" dedup) removal with document reassembly (q112), and
  * incremental batch-vs-corpus dedup (q113) — the form dedup actually
  * takes in a lakehouse, where yesterday's corpus is stored state and
  * only today's batch is new. Reference scope: the reference lakehouse
  * dedups nothing (its silver layer is per-row casts — reference
  * src/10_silver/bronze_to_silver.py); these extend the
  * training-data-pipeline surface the driver prompt asks for, at the
  * granularity C4/RefinedWeb-class corpus builds use.
  *
  * Scale shapes:
  *   - q112: the segment frame is built NARROWLY (sequence + posexplode
  *     per doc — q83's exchange-free chunking idiom); first-occurrence
  *     selection is a hash groupBy on the segment digest + a join back
  *     on the same key (two digest-keyed exchanges, two-phase
  *     HashAggregate, no windows — a per-digest window would sort every
  *     partition); reassembly is ONE doc_id exchange carrying only kept
  *     segment text. Nothing ever moves whole documents.
  *   - q113: the corpus side collapses to (digest, min doc_id) BEFORE
  *     the join — at 100 TB that aggregate is the stored dedup manifest
  *     (q87's incremental-gold discipline applied to dedup state), so
  *     the steady-state cost is |batch| + one digest-keyed join against
  *     the manifest, never a corpus rescan. The in-query recompute here
  *     exists so the oracle can replay the whole lifecycle from raw
  *     tables.
  */
object SegmentDedup {

  /** Tokens per dedup segment (q112): the "line" granularity. The
    * corpus is single-line word salad (no \n\n paragraph breaks), so
    * segments are fixed non-overlapping 20-token windows — the same
    * deterministic, oracle-replayable geometry q83 uses for chunks. */
  val SegTokens = 20

  /** Fraction of the doc_id space (by max id) treated as the
    * already-ingested corpus in q113; the rest is "today's batch". */
  val CorpusFrac = 0.8

  /** (doc_id, seg_idx) packed into one long so "first occurrence" is a
    * single primitive MIN (a struct-valued min falls back to
    * SortAggregate; the packed long stays in two-phase HashAggregate —
    * the q45 packedOrderKey discipline). Exact while 0 <= seg_idx <
    * 2^20 (a 20M-token doc) and 0 <= doc_id < 2^43; both guarded
    * loudly because a silent wrap would re-order first occurrences. */
  private def packedSegKey(docId: Column, segIdx: Column): Column = {
    val guarded = when(
      docId < 0L || docId >= lit(1L << 43) || segIdx < 0L || segIdx >= lit(1L << 20),
      raise_error(concat(
        lit("segment packing precondition violated: (doc_id, seg_idx) outside [0,2^43)x[0,2^20): "),
        docId.cast("string"), lit(","), segIdx.cast("string"))))
      .otherwise(docId)
    shiftleft(guarded, 20) + segIdx
  }

  /** The q112 segment frame: one row per (doc_id, seg_idx) with the
    * segment text and digest. Narrow — no exchange. */
  private[graft] def segments(s: SparkSession, d: String): DataFrame =
    segmentsOf(Tables.documents(s, d))

  /** Frame-parameterized twin of [[segments]] so specs can run the
    * operator over constructed fixtures (the testdata has no natural
    * byte-identical docs at any SF — measured, r9 verdict). */
  private[graft] def segmentsOf(docs: DataFrame): DataFrame = {
    val w = tokens(col("text"))
    docs
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0), size(col("w")) - 1, lit(SegTokens))))
      .select(col("doc_id"), col("pos").cast("long").as("seg_idx"),
        concat_ws(" ", slice(col("w"), col("col") + 1, lit(SegTokens))).as("seg_text"))
      .withColumn("dg", md5(col("seg_text").cast("binary")))
  }

  /** q112 core, exposed for the spec's invariant checks. */
  private[graft] def segmentDedup(s: SparkSession, d: String): DataFrame =
    segmentDedupOf(Tables.documents(s, d))

  /** Frame-parameterized twin of [[segmentDedup]] (see [[segmentsOf]]). */
  private[graft] def segmentDedupOf(docs: DataFrame): DataFrame = {
    val segs = segmentsOf(docs)
    // first global occurrence of each distinct segment: hash agg on the
    // digest, then join the winners back on the same key (AQE sizes it)
    val keepers = segs
      .groupBy("dg")
      .agg(min(packedSegKey(col("doc_id"), col("seg_idx"))).as("keep_packed"))
    segs.join(keepers, Seq("dg"))
      .withColumn("kept",
        packedSegKey(col("doc_id"), col("seg_idx")) === col("keep_packed"))
      // ONE doc_id exchange: count all segments, count survivors, and
      // reassemble the survivors in order (collect_list skips the nulls
      // the `when` leaves for dropped segments; array_sort restores
      // seg_idx order after the unordered shuffle arrival)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(
          when(col("kept"), struct(col("seg_idx"), col("seg_text"))))).as("kept_segs"))
      .select(col("doc_id"), col("n_segs"), col("n_kept"),
        when(col("n_kept") === 0, lit(null).cast("string"))
          .otherwise(md5(array_join(
            transform(col("kept_segs"), x => x("seg_text")), " ").cast("binary")))
          .as("kept_md5"))
  }

  /** q113 core: verdict per batch doc against the pre-cutoff corpus. */
  private[graft] def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("dg"))
    // data-derived ingest cutoff (top 20% of the id space is the batch);
    // one 1-row aggregate folded in by broadcast, the q78 idiom
    val cutoff = docs.agg(
      floor(lit(CorpusFrac) * (max(col("doc_id")) + 1)).as("cutoff"))
    val keyed = docs.crossJoin(broadcast(cutoff))
    val corpus = keyed.filter(col("doc_id") < col("cutoff"))
    val batch = keyed.filter(col("doc_id") >= col("cutoff"))
    // the stored-manifest side: one row per distinct corpus digest
    val corpusMin = corpus.groupBy("dg").agg(min(col("doc_id")).as("corpus_src"))
    // within-batch first occurrence (a batch can carry its own dups)
    val batchMin = batch.groupBy("dg").agg(min(col("doc_id")).as("batch_first"))
    batch.join(corpusMin, Seq("dg"), "left")
      .join(batchMin, Seq("dg"))
      .select(col("doc_id"),
        when(col("corpus_src").isNotNull, "dup_of_corpus")
          .when(col("batch_first") < col("doc_id"), "dup_in_batch")
          .otherwise("new").as("verdict"),
        when(col("corpus_src").isNotNull, col("corpus_src"))
          .when(col("batch_first") < col("doc_id"), col("batch_first"))
          .otherwise(lit(null).cast("long")).as("dup_src"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // segment-level dedup + reassembly: every 20-token segment keeps
    // only its first global occurrence (ordered by (doc_id, seg_idx));
    // per doc, how many segments survive and the digest of the
    // reassembled text. The C4 "deduplicate at sub-document
    // granularity" operator — doc-level dedup (q25) misses a duplicated
    // paragraph pasted into an otherwise-new page.
    "q112_dedup_segments" -> ((s, d) =>
      segmentDedup(s, d).orderBy("doc_id")),

    // incremental dedup: today's batch (top 20% of the id space)
    // deduped against the already-ingested corpus AND within itself —
    // verdict + provenance per batch doc. The lifecycle form of q25:
    // the corpus side is the stored digest manifest at scale.
    "q113_dedup_incremental" -> ((s, d) =>
      incrementalDedup(s, d).orderBy("doc_id"))
  )

  val oracleSql: Map[String, String] = Map(
    "q112_dedup_segments" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
         |), segs AS (
         |  SELECT doc_id, CAST(start // $SegTokens AS BIGINT) AS seg_idx,
         |         array_to_string(list_slice(w, start + 1, start + $SegTokens), ' ') AS seg_text
         |  FROM (SELECT doc_id, w, UNNEST(range(0, len(w), $SegTokens)) AS start FROM toks)
         |), keyed AS (
         |  SELECT doc_id, seg_idx, seg_text, md5(seg_text) AS dg,
         |         doc_id * 1048576 + seg_idx AS packed
         |  FROM segs
         |), keepers AS (
         |  SELECT dg, MIN(packed) AS keep_packed FROM keyed GROUP BY dg
         |), flagged AS (
         |  SELECT k.doc_id, k.seg_idx, k.seg_text,
         |         k.packed = kp.keep_packed AS kept
         |  FROM keyed k JOIN keepers kp USING (dg)
         |)
         |SELECT doc_id, COUNT(*) AS n_segs,
         |       CAST(COALESCE(SUM(CASE WHEN kept THEN 1 END), 0) AS BIGINT) AS n_kept,
         |       CASE WHEN COALESCE(SUM(CASE WHEN kept THEN 1 END), 0) = 0 THEN NULL
         |            ELSE md5(string_agg(CASE WHEN kept THEN seg_text END, ' ' ORDER BY seg_idx))
         |       END AS kept_md5
         |FROM flagged
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    "q113_dedup_incremental" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, md5(text) AS dg FROM documents
         |), c AS (
         |  SELECT CAST(FLOOR($CorpusFrac * (MAX(doc_id) + 1)) AS BIGINT) AS cutoff FROM keyed
         |), corpus_min AS (
         |  SELECT dg, MIN(doc_id) AS corpus_src FROM keyed, c
         |  WHERE doc_id < cutoff GROUP BY dg
         |), batch AS (
         |  SELECT doc_id, dg FROM keyed, c WHERE doc_id >= cutoff
         |), batch_min AS (
         |  SELECT dg, MIN(doc_id) AS batch_first FROM batch GROUP BY dg
         |)
         |SELECT b.doc_id,
         |       CASE WHEN cm.corpus_src IS NOT NULL THEN 'dup_of_corpus'
         |            WHEN bm.batch_first < b.doc_id THEN 'dup_in_batch'
         |            ELSE 'new' END AS verdict,
         |       CASE WHEN cm.corpus_src IS NOT NULL THEN cm.corpus_src
         |            WHEN bm.batch_first < b.doc_id THEN bm.batch_first
         |       END AS dup_src
         |FROM batch b
         |LEFT JOIN corpus_min cm USING (dg)
         |JOIN batch_min bm USING (dg)
         |ORDER BY b.doc_id""".stripMargin
  )

  val rowsOnly: Set[String] = Set.empty
}
