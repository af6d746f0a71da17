package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of registered queries. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
