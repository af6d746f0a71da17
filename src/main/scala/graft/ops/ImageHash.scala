package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** q212: perceptual difference-hash (dHash) over the image media
  * column — the 64-bit fingerprint an image-dedup pass buckets on
  * (the visual twin of q24/q120's text fingerprints, and the
  * candidate key the q28 pigeonhole join would consume for
  * hamming-bounded near-dup pairs at corpus scale). Standard dHash
  * geometry: an 8-row × 9-column gray grid; bit (r, c) = 1 iff cell
  * (r, c)'s mean luma is strictly below cell (r, c+1)'s — 8×8 = 64
  * horizontal-gradient bits, invariant to global brightness scaling
  * and to container format (BMP's bottom-up storage and PPM decode to
  * the same orientation-corrected raster, so the SAME content bytes
  * produce the SAME hash in either container — pinned in spec).
  *
  * Exactness: cell means compare via integer cross-multiplication
  * over exact (Σ(R+G+B), count) grid sums ([[MediaCodec.grayGridSums]])
  * — sumL·cntR < sumR·cntL — so no float rounding can flip a
  * near-tie bit and the hash is bit-stable across JVMs. HYBRID oracle
  * (the q138/q139 convention): mime and container geometry derive
  * independently in SQL from the encoder contracts; the dhash column,
  * which isn't portable SQL, is regression-pinned against the
  * committed fixture parquet (tools/fixtures/q212_expected.parquet,
  * generated once by GenMultimodalFixture; MultimodalSpec-style hand
  * fixtures in ImageHashSpec gate what a "legitimate" change is).
  *
  * Scale shape: narrow per-row decode + 81 integer cells per image
  * inside one mapPartitions — no shuffle except the presentation
  * sort. The dedup join over these hashes is the q28 plan verbatim
  * (4×16-bit pigeonhole chunks ⇒ hamming ≤ 3 candidates).
  */
object ImageHash {

  private[graft] val GridRows = 8
  private[graft] val GridCols = 9

  /** 64-bit dHash from exact integer grid sums; bit k = r·8 + c. */
  private[graft] def dHash64(mime: String, payload: Array[Byte]): Long = {
    val (sums, counts) = MediaCodec.grayGridSums(mime, payload, GridRows, GridCols)
    var h = 0L
    var r = 0
    while (r < GridRows) {
      var c = 0
      while (c < GridCols - 1) {
        val i = r * GridCols + c
        // meanL < meanR  ⇔  sumL·cntR < sumR·cntL  (counts > 0)
        if (sums(i) * counts(i + 1) < sums(i + 1) * counts(i))
          h |= 1L << (r * (GridCols - 1) + c)
        c += 1
      }
      r += 1
    }
    h
  }

  private[graft] def dhashFrame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.asMedia(s, d)
      .filter(m => m.mime == MediaCodec.BmpMime || m.mime == MediaCodec.PpmMime)
      .mapPartitions(_.map { m =>
        val dec = MediaCodec.decode(m.mime, m.payload)
        (m.doc_id, m.mime, dec.width, dec.height, dHash64(m.mime, m.payload))
      })
      .toDF("doc_id", "mime", "width", "height", "dhash")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q212_image_dhash" -> ((s, d) => dhashFrame(s, d)))

  /** Mime + geometry from the encoder contracts (the q138 geo CTE);
    * dhash regression-pinned against the committed fixture.
    */
  val oracleSql: Map[String, String] = Map(
    "q212_image_dhash" ->
      s"""WITH g AS (
         |  SELECT doc_id, doc_id % 3 AS fmt,
         |         octet_length(CAST(text AS BLOB)) AS n,
         |         GREATEST(1, CAST(CEIL(SQRT(octet_length(CAST(text AS BLOB)) / 3.0)) AS BIGINT)) AS w
         |  FROM documents WHERE doc_id % 3 < 2
         |)
         |SELECT g.doc_id,
         |       CASE g.fmt WHEN 0 THEN '${MediaCodec.BmpMime}'
         |                  ELSE '${MediaCodec.PpmMime}' END AS mime,
         |       CAST(g.w AS INTEGER) AS width,
         |       CAST(GREATEST(1, CAST(CEIL(g.n / (3.0 * g.w)) AS BIGINT)) AS INTEGER)
         |         AS height,
         |       f.dhash
         |FROM g
         |JOIN read_parquet('${Multimodal.FixtureDir}/q212_expected.parquet') f
         |  USING (doc_id)
         |ORDER BY g.doc_id""".stripMargin)

  val rowsOnly: Set[String] = Set.empty
}
