package graft

/** Harness-side log tuning shared by the Bench/Verify mains and the test
  * session.
  */
object Logs {

  /** WindowExec warns "No Partition Defined ... single partition" on any
    * unpartitioned window. Every such window in this engine is a dim
    * build over a provably tiny frame (StarOps.tinyGlobalWindow — bounded
    * by dim cardinality, not data volume), where the single partition is
    * by design; partitioning by a constant does NOT help because the
    * optimizer folds the constant spec away before WindowExec sees it.
    * So the warning is suppressed at the logger, scoped to the one class
    * — any other WindowExec log (errors included) still surfaces.
    */
  def silenceTinyWindowWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
