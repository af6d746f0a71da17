package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run a subset of SparkEntry.queries (args = sfDir outDir
  * name...) and dump result parquet + that subset's oracle SQL, for a
  * local DuckDB cross-check before the driver's gate runs. Mirrors
  * Verify's session config exactly so a local green means a gate green.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.silenceTinyWindowWarning() // AFTER setLogLevel: setAllLevels would clobber it
    graft.Logs.silenceCheckpointReleaseWarning()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[verify-one] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // subset oracle_sql.json so tools/check.py runs unchanged on outDir
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
