package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Warehouse-lifecycle operators beyond the reference's one-shot load
  * (`SQL/02_load_star_schema.sql` rebuilds dims in full each run): SCD
  * type-2 history tracking and incremental gold maintenance — the two
  * operations that replace "recompute everything" once the fact history
  * is too large to rescan.
  */
object LakehouseOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SCD type-2 dimension history: run-length encode each customer's
    // order-priority over time into (valid_from, valid_to, is_current)
    // intervals — the history a type-2 dim keeps where the reference's
    // dims overwrite in place. Gaps-and-islands: a lag over
    // (custkey | odate, orderkey) flags change points, a running sum
    // numbers the runs, one partition-local aggregate collapses each run,
    // and a lead closes the intervals. Scale shape: ONE shuffle on
    // custkey — the run aggregate groups on (custkey, version) and the
    // lead window re-partitions on custkey, both satisfied by the lag
    // window's hash partitioning, so all four steps share one exchange.
    "q80_scd2_history" -> ((s, d) =>
      scd2Runs(Tables.orders(s, d).select(
        col("o_custkey"),
        to_date(col("o_orderdate")).as("odate"),
        col("o_orderkey"),
        col("o_orderpriority").as("priority")))
        .orderBy("custkey", "version")),

    // Incremental SCD2 maintenance — the production path for q80's
    // history once the fact is too large to rescan: a new batch of
    // orders reworks ONLY the customers it touches (their full order
    // history re-runs the run-length encoding — key-granular
    // recomputation), while every untouched customer's history rows
    // pass through verbatim from the stored table (here: the
    // pre-cutoff build standing in for the stored history, as in q87).
    // The splice equals the full rebuild exactly — the oracle IS q80's
    // full-history SQL — because SCD2 history is per-customer
    // independent: a batch for customer A can never change customer
    // B's intervals. Scale shape: the anti/semi splits broadcast the
    // touched-customer id set (batch-sized, small by definition), so
    // the stored side never shuffles.
    "q99_scd2_incremental" -> ((s, d) => {
      val cutoff = lit("2001-01-01").cast("date")
      val all = Tables.orders(s, d).select(
        col("o_custkey"),
        to_date(col("o_orderdate")).as("odate"),
        col("o_orderkey"),
        col("o_orderpriority").as("priority"))
      val touched = all.filter(col("odate") >= cutoff)
        .select(col("o_custkey")).distinct()
      // stored history (pre-cutoff build), minus touched customers
      val untouched = scd2Runs(all.filter(col("odate") < cutoff))
        .join(broadcast(touched), col("custkey") === touched("o_custkey"),
          "left_anti")
      // touched customers: recompute from their own full order history
      val reworked = scd2Runs(
        all.join(broadcast(touched), Seq("o_custkey"), "left_semi"))
      untouched.unionByName(reworked)
        .orderBy("custkey", "version")
    }),

    // Incremental gold maintenance: the monthly revenue gold table is
    // NOT recomputed from scratch when a new batch of orders lands —
    // the stored gold (here: everything before the cutoff) merges with
    // the batch's partial aggregate via a full-outer coalesce-and-add.
    // Exact because the measures are algebraic: DECIMAL sums and counts
    // merge losslessly, so merged == full recompute bit-for-bit (the
    // oracle IS the full recompute; LakehouseSpec pins the engine-side
    // differential too). At 100 TB this is the difference between
    // scanning one day and scanning ten years: history is touched only
    // through its k-row aggregate.
    "q87_incremental_gold" -> ((s, d) => {
      val cutoff = lit("2001-01-01").cast("date")
      val stored = goldMonthly(s, d, col("o_orderdate") < cutoff)
      val batch = goldMonthly(s, d, col("o_orderdate") >= cutoff)
      mergeGold(stored, batch)
        .orderBy("region_name", "year", "month")
    })
  )

  /** Run-length encode (o_custkey | odate, o_orderkey, priority) rows
    * into SCD2 intervals. All four steps — lag, running change count,
    * (custkey, version) run aggregate, interval-closing lead — hash-
    * partition on custkey alone, so Catalyst plans ONE exchange for the
    * chain (pinned in LakehouseSpec).
    */
  private[graft] def scd2Runs(ordered: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("odate", "o_orderkey")
    val runs = ordered
      .withColumn("prev_p", lag(col("priority"), 1).over(w))
      .withColumn("chg",
        when(col("prev_p").isNull || col("prev_p") =!= col("priority"), 1)
          .otherwise(0))
      .withColumn("version",
        sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("int"))
      .groupBy(col("o_custkey").as("custkey"), col("version"))
      // priority is constant within a run by construction (any change
      // starts a new version), so max() is just the run's value
      .agg(max(col("priority")).as("priority"),
        min(col("odate")).as("valid_from"),
        count(lit(1)).as("n_orders"))
    val byVersion = Window.partitionBy("custkey").orderBy("version")
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to").isNull)
      .select("custkey", "version", "priority", "valid_from", "valid_to",
        "n_orders", "is_current")
  }

  /** Monthly gold partial over the orders slice matching `pred`:
    * (region, year, month) | exact DECIMAL revenue + order count. The
    * predicate reaches the parquet scan (pushed filter on o_orderdate),
    * and the region enrichment joins the DIMS onto the filtered slice
    * directly (customer on custkey, nation/region broadcast) — NOT
    * through `orderRegion`, whose internal unfiltered orders scan would
    * make the "incremental" batch pay a full fact scan anyway.
    */
  private[graft] def goldMonthly(s: SparkSession, d: String,
                                 pred: Column): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(pred)
      .select(col("o_custkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("year"),
        month(col("o_orderdate")).as("month"))
    val dim = StarSchema.custRegion(s, d)
    o.join(dim, o("o_custkey") === dim("c_custkey"))
      .groupBy("region_name", "year", "month")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** Additive merge of two partial-aggregate frames sharing a grain:
    * full-outer on `keys`, measure columns coalesce-added. Types come
    * from the stored side, and the result is cast BACK to them so the
    * stored schema never drifts across merges (decimal addition widens
    * precision by one per merge otherwise); ANSI mode turns a true
    * overflow into a loud error, not a silent wrap. Exact for DECIMAL
    * and integral measures — the algebraic-aggregate property that
    * makes incremental view maintenance equal the full recompute.
    */
  private[graft] def mergeAdditive(stored: DataFrame, batch: DataFrame,
                                   keys: Seq[String],
                                   measures: Seq[String]): DataFrame = {
    val types = measures.map(m => m -> stored.schema(m).dataType).toMap
    stored.as("a").join(batch.as("b"), keys, "full_outer")
      .select(keys.map(col) ++ measures.map { m =>
        val zero = lit(0).cast(types(m))
        (coalesce(col(s"a.$m"), zero) + coalesce(col(s"b.$m"), zero))
          .cast(types(m)).as(m)
      }: _*)
  }

  /** q87's merge: additive on the monthly grain, then ONE presentation
    * cast to double.
    */
  private[graft] def mergeGold(stored: DataFrame, batch: DataFrame): DataFrame =
    mergeAdditive(stored, batch, Seq("region_name", "year", "month"),
      Seq("revenue", "n_orders"))
      .withColumn("revenue", col("revenue").cast("double"))

  /** One-pass full recompute of the q87 gold — the differential twin
    * LakehouseSpec compares the incremental merge against.
    */
  private[graft] def goldFull(s: SparkSession, d: String): DataFrame =
    goldMonthly(s, d, lit(true))
      .select(col("region_name"), col("year"), col("month"),
        col("revenue").cast("double").as("revenue"), col("n_orders"))

  /** The full SCD2 rebuild in SQL — the oracle for BOTH q80 (direct
    * build) and q99 (incremental splice): the two must agree row for
    * row, which is the whole correctness claim of the incremental path.
    */
  private val Scd2Sql =
    """WITH ordered AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS odate, o_orderkey,
        |         o_orderpriority AS priority
        |  FROM orders
        |), flagged AS (
        |  SELECT *, CASE WHEN LAG(priority) OVER w IS NULL
        |                   OR LAG(priority) OVER w <> priority
        |                 THEN 1 ELSE 0 END AS chg
        |  FROM ordered
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY odate, o_orderkey)
        |), versioned AS (
        |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
        |              ORDER BY odate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS INTEGER) AS version
        |  FROM flagged
        |), runs AS (
        |  SELECT o_custkey AS custkey, version, MAX(priority) AS priority,
        |         MIN(odate) AS valid_from, COUNT(*) AS n_orders
        |  FROM versioned
        |  GROUP BY o_custkey, version
        |)
        |SELECT custkey, version, priority, valid_from,
        |       LEAD(valid_from) OVER w AS valid_to, n_orders,
        |       LEAD(valid_from) OVER w IS NULL AS is_current
        |FROM runs
        |WINDOW w AS (PARTITION BY custkey ORDER BY version)
        |ORDER BY custkey, version""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q80_scd2_history" -> Scd2Sql,
    "q99_scd2_incremental" -> Scd2Sql,

    // the oracle is the FULL recompute — the merge must equal it exactly
    "q87_incremental_gold" ->
      """SELECT r.r_name AS region_name,
        |       CAST(year(o.o_orderdate) AS INTEGER) AS year,
        |       CAST(month(o.o_orderdate) AS INTEGER) AS month,
        |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY region_name, year, month
        |ORDER BY region_name, year, month""".stripMargin
  )

  val rowsOnly: Set[String] = Set.empty
}
