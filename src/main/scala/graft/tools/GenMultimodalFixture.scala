package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-shot generator for the q138/q139 expected-digest fixtures
  * (dev tool, not part of the driver contract). Runs the multimodal
  * decode/thumbnail digest queries at sf0.01 — the driver's verify SF —
  * and writes each result as a SINGLE parquet file under
  * [[graft.ops.Multimodal.FixtureDir]], which the DuckDB oracle reads
  * verbatim. Re-run + recommit ONLY when the decoders legitimately
  * change (MultimodalSpec's hand fixtures gate what "legitimate" means);
  * any other divergence from these files is a decode regression the
  * correctness gate should catch.
  *
  *   sbt 'runMain graft.tools.GenMultimodalFixture'
  */
object GenMultimodalFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    def writeOne(df: DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_fixture").toString
      // one part file so the fixture is a single committed .parquet
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")).head
      val dest = Paths.get(graft.ops.Multimodal.FixtureDir, name)
      Files.createDirectories(dest.getParent)
      Files.move(Paths.get(part), dest, StandardCopyOption.REPLACE_EXISTING)
      println(s"[fixture] wrote $dest")
    }
    writeOne(graft.ops.Multimodal.decodeDigest(spark, sf), "q138_expected.parquet")
    writeOne(graft.ops.Multimodal.thumbnailDigest(spark, sf), "q139_expected.parquet")
    // q212 needs no fixture since r18: its dhash oracle is a full
    // encoder-contract replay in SQL (ImageHash.oracleSql)
    spark.stop()
  }
}
