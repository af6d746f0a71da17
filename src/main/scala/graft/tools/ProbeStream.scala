package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe for the streaming replay cost (dev tool). */
object ProbeStream {
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

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    (1 to 3).foreach { i =>
      time(s"q116 run $i") {
        graft.Bench.exec(graft.SparkEntry.queries("q116_stream_hourly_replay")(spark, d))
      }
    }
    (1 to 3).foreach { i =>
      time(s"q119 run $i") {
        graft.Bench.exec(graft.SparkEntry.queries("q119_stream_hourly_append")(spark, d))
      }
    }
    // breakdown: schema read vs streaming run
    time("schema read") {
      spark.read.parquet(s"$d/events.parquet").schema
    }
    // does state-store partition count drive the per-run cost?
    Seq("8", "4").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      (1 to 2).foreach { i =>
        time(s"q116 run $i (parts=$p)") {
          graft.Bench.exec(graft.SparkEntry.queries("q116_stream_hourly_replay")(spark, d))
        }
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
