package graft.tools

import org.apache.spark.sql.SparkSession

/** r21 shared-build decomposition probe: times each chain step
  * individually (first call = build or store read; FrameMemo then holds
  * it), printing store hit/miss deltas per step — the per-artifact
  * attribution BENCH_DETAIL's per-chain wall times can't give.
  */
object ProbeBuild {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.silenceTinyWindowWarning()
    graft.Logs.silenceCheckpointReleaseWarning()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def step(name: String)(f: => Any): Unit = {
      val (h0, m0) = graft.ops.ArtifactStore.stats
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      val (h1, m1) = graft.ops.ArtifactStore.stats
      println(f"PROBE ${name}%-28s ${dt}%7.2f s  store +${h1 - h0}h/+${m1 - m0}m")
    }
    import graft.ops._
    step("knnGraphLsh")(SimilaritySearch.knnGraphLsh(spark, d))
    step("knnGraphExact")(SimilaritySearch.knnGraphExact(spark, d))
    step("knnExactTop5")(SimilaritySearch.knnExactTop5(spark, d))
    step("knnLshTop5")(SimilaritySearch.knnLshTop5(spark, d))
    step("knnIvfTop5")(SimilaritySearch.knnIvfTop5(spark, d))
    step("hybridRanked")(Retrieval.hybridRanked(spark, d))
    step("pqCodes")(graft.Bench.exec(PqOps.pqCodes(spark, d)))
    step("ivfPqSearch")(PqOps.ivfPqSearch(spark, d))
    step("dsirScores")(Dsir.importanceScores(spark, d))
    step("gramOf")(PowerIteration.gramOf(spark, d))
    step("trainedBpe")(LmTokenizer.trainedBpe(spark, d))
    spark.stop()
  }
}
