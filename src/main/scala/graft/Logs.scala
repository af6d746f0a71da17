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
    * So the warning is suppressed at the logger. HONEST SCOPE: this
    * silences the class-level WARN for EVERY unpartitioned window in the
    * harness sessions, including a future accidental one over real data
    * — which is why PlanSpec's global-window sweep pins the allowlist of
    * queries whose plans may carry an empty partition spec at all; a new
    * global window fails the build there instead of warning in a log
    * nobody reads. ERROR-level WindowExec logs still surface.
    */
  def silenceTinyWindowWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  /** RDD.unpersist on a locally-checkpointed RDD warns "lineage has been
    * truncated and cannot be recomputed after unpersisting" — once per
    * released iterate, so a 10-round PageRank emits 10 of them. Here the
    * release is deliberate and safe by construction: ColumnBridge
    * .releaseCheckpoint only ever frees SUPERSEDED iterates of a
    * fixed-round loop, which no future plan references (GraphSpec pins
    * the residency invariant). Both checkpoint entry points build the
    * internal-row RDD via `.map(_.copy())`, so the logger category is
    * always MapPartitionsRDD; that class logs nothing else at WARN in
    * these code paths. ERROR-level logs still surface.
    */
  def silenceCheckpointReleaseWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
}
