package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query timing probe with the bench's noop action (dev tool).
  * Usage: runMain graft.tools.ProbeQ47 q47_dedup_groups q46_asof_custom_op
  * Pass -explain to also print each query's formatted physical plan.
  */
object ProbeQ47 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-")).toSeq match {
      case Nil => Seq("q47_dedup_groups", "q43_dedup_embedding_lsh",
        "q26_dedup_ngram_jaccard", "q27_dedup_minhash_lsh")
      case qs => qs
    }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    exec(graft.SparkEntry.queries("q16_dim_region")(spark, d)) // warmup
    for (q <- names) {
      if (explain) graft.SparkEntry.queries(q)(spark, d).explain("formatted")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        exec(graft.SparkEntry.queries(q)(spark, d))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $q%-28s median ${times(1)}%6.2f s  runs ${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
