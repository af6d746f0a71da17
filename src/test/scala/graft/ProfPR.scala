import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (test scope): measures PageRank convergence on the real
  * q90 LSH k-NN graph — per-round max |Δrank| via a driver-side scalar
  * replay — to size the early-exit epsilon in GraphOps.pageRank.
  * Usage: sbt 'Test/runMain ProfPR [sfDir]'
  */
object ProfPR {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val edges = graft.ops.SimilaritySearch.graphQueries("q90_knn_graph_lsh")(spark, d)
      .select(col("vec_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = graft.Tables.embeddings(spark, d).select("vec_id")
      .collect().map(_.getLong(0))
    val n = nodes.length
    println(s"[profpr] n=$n edges=${edges.length}")
    val out = edges.groupBy(_._1).view.mapValues(_.length).toMap
    val incoming = edges.groupBy(_._2)
    val d85 = graft.ops.GraphOps.Damping
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (it <- 1 to 30) {
      val dangling = nodes.filter(v => !out.contains(v)).map(rank).sum
      val base = (1 - d85) / n + d85 * dangling / n
      val next = nodes.map { v =>
        val inflow = incoming.getOrElse(v, Array.empty)
          .map { case (s, _) => rank(s) / out(s) }.sum
        v -> (base + d85 * inflow)
      }.toMap
      val maxDelta = nodes.map(v => math.abs(next(v) - rank(v))).max
      println(f"[profpr] iter $it%2d maxDelta=$maxDelta%.3e")
      rank = next
    }
    spark.stop()
  }
}
