package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM-wide; suites run in one
  * forked test JVM).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Logs.silenceTinyWindowWarning() // AFTER setLogLevel: setAllLevels would clobber it
    Logs.silenceCheckpointReleaseWarning()
    s
  }
}
