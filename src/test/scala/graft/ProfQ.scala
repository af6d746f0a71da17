import org.apache.spark.sql.SparkSession

/** Dev profiling harness (test scope, not part of the driver contract):
  * times any registered query 3× at sf0.1 under the bench session
  * config, after the same warmup Bench uses. Usage:
  *   sbt 'Test/runMain ProfQ q93_pagerank q89_knn_graph'
  * Run 1 includes JIT/codegen warmup; read runs 2-3.
  */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_PROF_SF_DIR", "/root/testdata/sf0.1")
    graft.Bench.exec(graft.SparkEntry.queries("q16_dim_region")(spark, d))
    for (q <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.Bench.exec(graft.SparkEntry.queries(q)(spark, d))
      println(f"[prof] $q run$i ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
