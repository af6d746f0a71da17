package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: median-of-3 timing for a set of queries at two SFs — the
  * measurement discipline behind SCALING.md's growth notes.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q116_stream_hourly_replay", "q117_ann_recall_report",
        "q118_pagerank_exact", "q119_stream_hourly_append")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.silenceTinyWindowWarning()
    graft.Logs.silenceCheckpointReleaseWarning()
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      // per-SF shared builds (the bench's pre-pass), untimed here
      try {
        graft.ops.SimilaritySearch.knnGraphLsh(spark, d)
        graft.ops.SimilaritySearch.knnGraphExact(spark, d)
      } catch { case _: Throwable => () }
      names.foreach { n =>
        System.gc()
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.Bench.exec(graft.SparkEntry.queries(n)(spark, d))
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"SCALE $d $n%-28s median ${ts(1)}%6.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
      }
    }
    spark.stop()
  }
}
