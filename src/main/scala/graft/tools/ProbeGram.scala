package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** r21 plan evidence for the q210/q214 Gram build (the builder is
  * internal — `PowerIteration.gramOf` collects it — so the registered
  * query's explain shows only the driver-side toDF; this probe explains
  * the distributed build itself). "BEFORE" is the r20 shape reproduced
  * verbatim from `PowerIteration.buildGram` at commit 299b0c8 (self-join
  * of the posexploded point table on vec_id); "AFTER" is the r21 shape
  * (chained posexplode outer product, no join).
  */
object ProbeGram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val Scale = graft.ops.PowerIteration.Scale

    println("=== gram_build_before (r20 shape: posexplode self-join on vec_id) ===")
    Tables.embeddings(spark, d)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        expr(s"CAST(ROUND(x * $Scale) AS BIGINT)").as("q"))
      .as("a").join(Tables.embeddings(spark, d)
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
        .select(col("vec_id"), col("i"),
          expr(s"CAST(ROUND(x * $Scale) AS BIGINT)").as("q")).as("b"),
        col("a.vec_id") === col("b.vec_id"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.q") * col("b.q")).as("g"), count(lit(1)).as("n"),
        max(abs(col("a.q"))).as("max_qa"), max(abs(col("b.q"))).as("max_qb"))
      .explain("formatted")

    println("=== gram_build_after (r21 shape: chained posexplode, no join) ===")
    Tables.embeddings(spark, d)
      .select(col("vec_id"),
        expr(s"transform(CAST(embedding AS array<double>), " +
          s"x -> CAST(ROUND(x * $Scale) AS BIGINT))").as("qs"))
      .select(posexplode(col("qs")).as(Seq("i", "qa")), col("qs"))
      .select(col("i"), col("qa"), posexplode(col("qs")).as(Seq("j", "qb")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("qa") * col("qb")).as("g"), count(lit(1)).as("n"),
        max(abs(col("qa"))).as("max_qa"), max(abs(col("qb"))).as("max_qb"))
      .explain("formatted")

    spark.stop()
  }
}
