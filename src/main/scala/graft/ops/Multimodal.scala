package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, processed in partition-local batches. The
  * decode step itself is STUBBED (no image/audio codecs in this
  * environment) with a deterministic fake; everything Spark-side —
  * schema, batching, partitioning, the typed Dataset boundary — is real
  * and is exactly what a libjpeg/ffmpeg-backed decoder would plug into.
  */
object Multimodal {

  /** One media row: payload + metadata (what an object-store manifest of
    * images/audio would scan to).
    */
  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Stub feature record a real decoder would emit (e.g. resized pixels,
    * mel spectrogram stats).
    */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
                           width: Int, height: Int, feature: Array[Float])

  /** STUB decode: deterministic fake standing in for an image/audio
    * codec. Real implementation would parse `payload` (JPEG/PNG/WAV...);
    * here dimensions and features derive from the bytes so results are
    * stable and testable. Runs per-partition over the iterator — the
    * batch shape a vectorized decoder needs (one codec init per
    * partition, not per row).
    */
  def decodePartition(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // per-partition "codec init" would happen here
    rows.map { r =>
      val h = java.util.Arrays.hashCode(r.payload)
      val width = 16 + math.floorMod(h, 1024)
      val height = 16 + math.floorMod(h >> 10, 1024)
      val feature = Array.tabulate(8)(i =>
        math.floorMod(h * (i + 1), 1000) / 1000.0f)
      MediaFeatures(r.doc_id, r.mime, r.payload.length, width, height, feature)
    }
  }

  /** documents → media frame: text bytes as the opaque payload. */
  def asMedia(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), lit("text/plain").as("mime"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary-column metadata scan: byte length + digest (oracle-checkable)
    "q34_multimodal_meta" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        lit("text/plain").as("mime"),
        length(col("text").cast("binary")).as("n_bytes"),
        md5(col("text").cast("binary")).as("checksum"))
        .orderBy("doc_id")),

    // full decode pipeline through the typed mapPartitions boundary;
    // rows-only (stubbed features aren't SQL-expressible)
    "q35_multimodal_decode" -> ((s, d) => {
      import s.implicits._
      asMedia(s, d)
        .mapPartitions(decodePartition)
        .toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          col("width"), col("height"),
          round(element_at(col("feature"), 1), 3).as("f0"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q34_multimodal_meta" ->
      """SELECT doc_id,
        |       'text/plain' AS mime,
        |       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |       md5(text) AS checksum
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )

  val rowsOnly: Set[String] = Set("q35_multimodal_decode")
}
