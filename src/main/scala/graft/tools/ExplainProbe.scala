package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q20_fact_star_keyed", "q07_star_filter_year")
    names.foreach { n =>
      println(s"=== $n ===")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
