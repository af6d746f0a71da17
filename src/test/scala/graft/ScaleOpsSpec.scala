package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ScaleOps

/** Skew-mitigation and co-location machinery: salted operations must be
  * exactly equivalent to their plain versions; bucketed tables must join
  * without a shuffle.
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val skewed = {
    // hot key: 90% of rows share key 1
    val rows = (1 to 900).map(i => (1L, i.toDouble)) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, i.toDouble))
    rows.toDF("k", "v")
  }
  private lazy val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
    (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "name")

  test("saltedJoin result equals the plain join") {
    val plain = skewed.join(dim, Seq("k")).orderBy("k", "v")
    val salted = ScaleOps.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .orderBy("k", "v")
    assert(salted.columns.toSet == plain.columns.toSet)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedSum equals plain groupBy sum") {
    val plain = skewed.groupBy("k").agg(sum("v").as("sum_v"))
    val salted = ScaleOps.saltedSum(skewed, Seq("k"), "v", salts = 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bucketed tables join without an exchange (co-located SMJ)") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the catalog is in-memory per JVM: a previous run's directory
    // survives the (no-op) DROP, so clear the location too
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val dir = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed").join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(j.count() == Tables.lineitem(spark, "/root/testdata/sf0.001").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("clusterBy orders within partitions without a global sort") {
    val df = ScaleOps.clusterBy(skewed, 4, col("k"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Sort") && !plan.toLowerCase.contains("global sort"))
    assert(df.count() == 1000)
  }
}
