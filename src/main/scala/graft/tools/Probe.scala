package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Ad-hoc plan/stage timing probe (dev tool, not part of the contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docs = Tables.documents(spark, d)
    time("docs scan")(docs.count())
    val sets = docs.select(col("doc_id"), col("lang"), shingles(col("text"), 3).as("sh"))
      .withColumn("n_sh", size(col("sh"))).filter(col("n_sh") > 0)
    time("shingleSets")(sets.count())
    val sigs = sets.withColumn("sig", graft.ops.Dedup.minhashSignature(col("sh")))
    time("minhash sigs")(sigs.count())
    val posting = sets.select(col("doc_id"), col("lang"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), col("lang"), xxhash64(col("shingle")).as("shingle"))
    time("posting")(posting.count())
    val rare = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100)
    time("rare shingles")(rare.count())
    val filtered = posting.join(rare.select("shingle"), Seq("shingle"))
    time("filtered posting")(filtered.count())
    val inter = filtered.as("a").join(filtered.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.lang") === col("b.lang") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    time("pair intersections")(inter.count())
    time("q26 full")(graft.ops.Dedup.queries("q26_dedup_ngram_jaccard")(spark, d).count())
    time("q27 full")(graft.ops.Dedup.queries("q27_dedup_minhash_lsh")(spark, d).count())
    time("q20 full")(graft.ops.ParityQueries.queries("q20_fact_star_keyed")(spark, d).count())
    spark.stop()
  }
}
