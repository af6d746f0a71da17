package graft.datagen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic bronze generator (S7/J7 — the Spark-first
  * re-expression of the reference's row generator,
  * `src/00_generate_raw/generate_energy_emissions.py:22-116`): a date
  * `sequence` crossJoined with literal dims, with the same dirty-data
  * profile (2% null + 1% literal "N/A" consumption, 1.5% null co2, ~1%
  * exact-duplicate rows).
  *
  * Randomness is derived from `xxhash64` of the row's natural key plus a
  * stream tag — NOT `rand(seed)`, whose values depend on partition layout
  * and would differ between local[32] and a 1000-executor cluster. Hash
  * PRNG is reproducible at any scale and any partitioning.
  */
object EnergyGen {
  val Regions = Seq("North", "South", "East", "West")
  val Sources = Seq("Electricity", "Gas", "Oil", "Renewables")
  val Sectors = Seq("Residential", "Industry", "Transport")

  private val Mod = 1000000007L

  /** Uniform [0,1) keyed by (stream tag, natural key columns). */
  private def u(tag: String, keys: Column*): Column =
    pmod(xxhash64((lit(tag) +: keys): _*), lit(Mod)).cast("double") / Mod.toDouble

  /** N(mean, sd) via Box–Muller over two hash-uniform streams. */
  private def gauss(tag: String, mean: Double, sd: Double, keys: Column*): Column = {
    val u1 = u(tag + "_u1", keys: _*) + lit(1e-12) // avoid log(0)
    val u2 = u(tag + "_u2", keys: _*)
    lit(mean) + lit(sd) * sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  /** Winter 1.25 / summer 1.10 / else 1.0 (reference :42). */
  def seasonFactor(dateCol: Column): Column =
    when(month(dateCol).isin(12, 1, 2), 1.25)
      .when(month(dateCol).isin(6, 7, 8), 1.10)
      .otherwise(1.0)

  private def days(s: SparkSession, start: String, end: String): DataFrame =
    s.range(1).select(explode(
      sequence(to_date(lit(start)), to_date(lit(end)), expr("interval 1 day"))).as("d"))

  /** Bronze energy table: `date` (string), `region`, `energy_source`,
    * `consumption_mwh` (string — doubles mixed with nulls and "N/A"),
    * `temperature_c` (double), plus ~1% appended exact duplicates.
    */
  def energyBronze(s: SparkSession, start: String = "2023-01-01",
                   end: String = "2024-12-31"): DataFrame = {
    import s.implicits._
    val base = days(s, start, end)
      .crossJoin(Regions.toDF("region"))
      .crossJoin(Sources.toDF("energy_source"))
    val k = Seq(col("d"), col("region"), col("energy_source"))
    val withVals = base
      .withColumn("temp_raw", gauss("temp", 12, 8, k: _*))
      .withColumn("consumption_raw",
        greatest(lit(0.0),
          gauss("cons", 900, 180, k: _*) * seasonFactor(col("d")) +
            (lit(8.0) - col("temp_raw")) * lit(18.0)))
      .withColumn("consumption_mwh",
        when(u("null_c", k: _*) < 0.02, lit(null).cast("string"))
          .when(u("na_c", k: _*) < 0.01, lit("N/A"))
          .otherwise(col("consumption_raw").cast("string")))
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("date"),
        col("region"), col("energy_source"), col("consumption_mwh"),
        round(col("temp_raw"), 2).as("temperature_c"))
    // ~1% exact duplicates, selected deterministically by row-key hash
    // (reference appends a 1% sample, generate_energy_emissions.py:113-116)
    val dupes = withVals.filter(
      u("dup", col("date"), col("region"), col("energy_source")) < 0.01)
    withVals.union(dupes)
  }

  /** Bronze emissions table: `date` (string), `region`, `sector`,
    * `co2_tonnes` (double, 1.5% null).
    */
  def emissionsBronze(s: SparkSession, start: String = "2023-01-01",
                      end: String = "2024-12-31"): DataFrame = {
    import s.implicits._
    val base = days(s, start, end)
      .crossJoin(Regions.toDF("region"))
      .crossJoin(Sectors.toDF("sector"))
    val k = Seq(col("d"), col("region"), col("sector"))
    val sectorMult = when(col("sector") === "Residential", 0.9)
      .when(col("sector") === "Industry", 1.3)
      .otherwise(1.15)
    base
      .withColumn("co2_raw",
        greatest(lit(0.0),
          gauss("co2", 420, 90, k: _*) * seasonFactor(col("d")) * sectorMult))
      .withColumn("co2_tonnes",
        when(u("null_e", k: _*) < 0.015, lit(null).cast("double"))
          .otherwise(col("co2_raw")))
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("date"),
        col("region"), col("sector"), col("co2_tonnes"))
  }
}
