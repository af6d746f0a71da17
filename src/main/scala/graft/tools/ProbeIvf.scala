package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r21: step-level decomposition of the knnIvfTop5 build (the warm
  * shared-build straggler) — which of the k-means/assign/join jobs owns
  * the ~7 s.
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def step(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE ${name}%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    import graft.ops.SimilaritySearch._
    val e = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    step("warmup scan")(e.write.format("noop").mode("overwrite").save())
    var cents: org.apache.spark.sql.DataFrame = null
    step("kmeans 2 iters + ckpt") {
      cents = kmeansCentroids(e, k = 16, iters = 2).localCheckpoint()
    }
    var assigned: org.apache.spark.sql.DataFrame = null
    step("assign + ckpt") {
      assigned = assignClusters(e, cents).localCheckpoint()
    }
    var q: org.apache.spark.sql.DataFrame = null
    step("probe side") {
      q = probeClusters(e.filter(col("vec_id") < 10), cents, nprobe = 2)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("cluster"))
    }
    step("join+window+ckpt") {
      import graft.functions.VectorFunctions.cosine
      val w5 = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
      broadcast(q).join(assigned, Seq("cluster"))
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("cos", cosine(col("qv"), col("v")))
        .withColumn("rank", row_number().over(w5).cast("int"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
          round(col("cos"), 4).as("cos_r"))
        .localCheckpoint()
    }
    // second time, everything warm in JIT: is the cost fixed or first-call?
    step("kmeans again") {
      kmeansCentroids(e, k = 16, iters = 2).localCheckpoint()
    }
    spark.stop()
  }
}
