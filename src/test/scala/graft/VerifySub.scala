import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev harness (test scope, not part of the driver contract): dump a
  * SUBSET of registered queries + their oracle SQL in graft.Verify's
  * output format, so tools/check.py can replay the driver's DuckDB
  * compare on just the queries under iteration. Usage:
  *   sbt 'Test/runMain VerifySub /root/testdata/sf0.01 /tmp/vsub q161_wordpiece_train'
  *   python3 tools/check.py /root/testdata/sf0.01 /tmp/vsub
  */
object VerifySub {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.silenceTinyWindowWarning()
    graft.Logs.silenceCheckpointReleaseWarning()
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.filter(q => names(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verifysub] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(o => names(o._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
