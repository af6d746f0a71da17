package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.StarSchema.{orderRegion, sumMoney, sumMoney6}

/** Analytics beyond the reference's own surface (SURVEY §2.6/§2.7 lists
  * these as absent-from-reference but engine-relevant): multi-aggregate
  * stats, ROLLUP subtotals, lag/lead deltas, set ops, sketch counts.
  */
object AnalyticsExtras {

  private def lineitemRegion(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .join(orderRegion(s, d).withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A2 analog: grouped avg/max/count in one pass. avg computed as
    // exact-sum / count (plain avg() over doubles is accumulation-order-
    // dependent under shuffle; sum of integral quantities and decimal
    // prices is not)
    "q36_monthly_stats" -> ((s, d) =>
      lineitemRegion(s, d)
        .groupBy("region_name", "year", "month")
        .agg(
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          max(col("l_quantity")).as("max_qty"),
          (sumMoney(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("records"))
        .orderBy("region_name", "year", "month")),

    // ROLLUP subtotals with grouping_id; explicit null ordering (rollup
    // null rows sort differently by default in Spark vs DuckDB)
    "q37_rollup_revenue" -> ((s, d) =>
      Tables.orders(s, d)
        .join(orderRegion(s, d).select("o_orderkey", "region_name"), Seq("o_orderkey"))
        .rollup(col("region_name"), year(col("o_orderdate")).as("year"))
        .agg(sumMoney(col("o_totalprice")).as("total"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("gid"), col("region_name").asc_nulls_last, col("year").asc_nulls_last)),

    // lag: month-over-month revenue delta per region
    "q38_revenue_mom_delta" -> ((s, d) => {
      val w = Window.partitionBy("region_name").orderBy("year", "month")
      StarSchema.factMonthly(s, d)
        .select("region_name", "year", "month", "total_revenue")
        .withColumn("prev_revenue", lag(col("total_revenue"), 1).over(w))
        .withColumn("delta", col("total_revenue") - col("prev_revenue"))
        .orderBy("region_name", "year", "month")
    }),

    // INTERSECT / EXCEPT: customer-retention buckets between two years
    "q39_retention_setops" -> ((s, d) => {
      def custs(y: Int) = Tables.orders(s, d)
        .filter(year(col("o_orderdate")) === y).select("o_custkey").distinct()
      val a = custs(1997)
      val b = custs(1998)
      Seq(
        ("both_years", a.intersect(b)),
        ("only_1997", a.except(b)),
        ("only_1998", b.except(a))
      ).map { case (n, df) =>
        df.agg(count(lit(1)).as("customers")).select(lit(n).as("bucket"), col("customers"))
      }.reduce(_ union _).orderBy("bucket")
    }),

    // HLL sketch count next to the exact count (rows-only: HLL estimates
    // are engine-specific)
    "q40_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .orderBy("l_returnflag"))
  )

  private val OrdersRegionCte =
    """WITH order_region AS (
      |  SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate, r.r_name AS region_name
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q36_monthly_stats" ->
      """WITH li AS (
        |  SELECT l.l_quantity, l.l_extendedprice, r.r_name AS region_name,
        |         CAST(year(o.o_orderdate) AS INTEGER) AS year,
        |         CAST(month(o.o_orderdate) AS INTEGER) AS month
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |)
        |SELECT region_name, year, month,
        |       SUM(l_quantity) / COUNT(*) AS avg_qty,
        |       MAX(l_quantity) AS max_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |       COUNT(*) AS records
        |FROM li
        |GROUP BY region_name, year, month
        |ORDER BY region_name, year, month""".stripMargin,

    "q37_rollup_revenue" ->
      s"""$OrdersRegionCte
         |SELECT region_name, CAST(year(o_orderdate) AS INTEGER) AS year,
         |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
         |       CAST(GROUPING(region_name) * 2 + GROUPING(year(o_orderdate)) AS INTEGER) AS gid
         |FROM order_region
         |GROUP BY ROLLUP(region_name, year(o_orderdate))
         |ORDER BY gid, region_name ASC NULLS LAST, year ASC NULLS LAST""".stripMargin,

    "q38_revenue_mom_delta" ->
      """WITH order_region AS (
        |  SELECT o.o_orderkey, r.r_name AS region_name,
        |         CAST(year(o.o_orderdate) AS INTEGER) AS year,
        |         CAST(month(o.o_orderdate) AS INTEGER) AS month
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |), fact_monthly AS (
        |  SELECT region_name, year, month,
        |         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem l JOIN order_region o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY region_name, year, month
        |)
        |SELECT region_name, year, month, total_revenue,
        |       LAG(total_revenue) OVER (PARTITION BY region_name ORDER BY year, month) AS prev_revenue,
        |       total_revenue - LAG(total_revenue) OVER (PARTITION BY region_name ORDER BY year, month) AS delta
        |FROM fact_monthly
        |ORDER BY region_name, year, month""".stripMargin,

    "q39_retention_setops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
        |     b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
        |SELECT * FROM (
        |  SELECT 'both_years' AS bucket, COUNT(*) AS customers
        |  FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        |  UNION ALL
        |  SELECT 'only_1997', COUNT(*)
        |  FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        |  UNION ALL
        |  SELECT 'only_1998', COUNT(*)
        |  FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
        |)
        |ORDER BY bucket""".stripMargin
  )

  val rowsOnly: Set[String] = Set("q40_approx_distinct")
}
