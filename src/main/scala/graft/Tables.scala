package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's read-only parquet testdata
  * (`/root/testdata/sf*`; see TESTDATA.md). All engine queries are
  * `DataFrame`-in/`DataFrame`-out over these tables so Catalyst sees one
  * end-to-end logical plan per query (scan → ... → sink) and can push
  * filters/projections into the parquet scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for. With `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench/tests) it scans as LongType nanos; normalize to a
    * microsecond TimestampType column here so downstream code sees one
    * schema. Day/hour/month truncations are unaffected by the ns→µs cut.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = table(s, d, "events")
    // integer `div`, NOT `/`: Column./ is a DOUBLE division, and epoch
    // nanos (~1.7e18) are far beyond double's 2^53 mantissa — the old
    // `(ts / 1000L).cast("long")` came back ±1µs on ~12% of rows (caught
    // by q58's session bounds; hour-grain queries never noticed)
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
