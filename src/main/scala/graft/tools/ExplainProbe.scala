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
    val d = "/root/testdata/sf0.01"
    println("=== q20 fact_star_keyed ===")
    graft.ops.ParityQueries.queries("q20_fact_star_keyed")(spark, d).explain("formatted")
    println("=== q07 star_filter_year ===")
    graft.ops.ParityQueries.queries("q07_star_filter_year")(spark, d).explain("formatted")
    spark.stop()
  }
}
