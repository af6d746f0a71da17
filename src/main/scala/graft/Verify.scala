package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // 2x cores, matching Bench (r19): partitions = cpus is one task wave
    // per stage — zero rebalance headroom when another process steals a
    // core, which stretched the driver-session heavy stages 3-8x for
    // three rounds. See Bench.main + SCALING.md §"Bench robustness".
    val shufflePartitions = sys.env.getOrElse(
      "SPARK_GRAFT_SHUFFLE_PARTITIONS", (cpus.toInt * 2).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.silenceTinyWindowWarning() // AFTER setLogLevel: setAllLevels would clobber it
    Logs.silenceCheckpointReleaseWarning()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // store evidence in the correctness session's own output (r21): a
    // driver correctness run self-reports whether it read warm artifacts
    // or rebuilt cold — the same fingerprint+hits/misses evidence
    // BENCH_DETAIL carries, on the "[verify]"-greppable stderr channel
    // (NOT as a file in outDir: the dump dir stays exactly one entry per
    // declared query + oracle_sql.json, whatever enumerates it).
    val (hits, misses) = ops.ArtifactStore.stats
    System.err.println(s"""[verify] artifact_store {"fingerprint": """ +
      s""""${ops.ArtifactStore.codeFingerprint}", "hits": $hits, "misses": $misses}""")
    spark.stop()
  }
}
