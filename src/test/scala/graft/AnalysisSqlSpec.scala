package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.datagen.EnergyGen
import graft.pipeline.{Analysis, EnergyStar, Medallion}

/** The reference's analysis surface through `spark.sql` (SURVEY §3.3:
  * SQL text → Analyzer → Catalyst → execution over the registered star
  * views) must agree with the DataFrame pipelines — two front-ends, one
  * engine.
  */
class AnalysisSqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val star: EnergyStar = {
    val e = Medallion.cleanEnergy(EnergyGen.energyBronze(spark, "2023-01-01", "2023-06-30"))
    val m = Medallion.cleanEmissions(EnergyGen.emissionsBronze(spark, "2023-01-01", "2023-06-30"))
    val s = EnergyStar.build(Medallion.energyMonthly(e),
      Medallion.emissionsMonthly(m), Medallion.carbonIntensity(e, m))
    EnergyStar.registerViews(spark, s)
    s
  }

  private def sqlMatchesDf(sql: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val viaSql = spark.sql(sql)
    assert(viaSql.exceptAll(df).isEmpty && df.exceptAll(viaSql).isEmpty,
      s"spark.sql result differs from DataFrame pipeline for:\n$sql")
  }

  test("Q2 monthly intensity: SQL text == DataFrame pipeline") {
    sqlMatchesDf(
      """SELECT r.region_name, t.year, t.month, f.total_energy_mwh,
        |       f.total_co2_tonnes, f.co2_per_mwh
        |FROM fact_carbon_intensity f
        |JOIN dim_region r ON r.region_id = f.region_id
        |JOIN dim_time t ON t.time_id = f.time_id
        |ORDER BY r.region_name, t.year, t.month""".stripMargin,
      Analysis.q2MonthlyIntensity(star))
  }

  test("Q3 top-5 window: SQL text == DataFrame pipeline") {
    sqlMatchesDf(
      """WITH ranked AS (
        |  SELECT r.region_name, t.year, t.month, f.co2_per_mwh,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY r.region_name
        |           ORDER BY f.co2_per_mwh DESC NULLS LAST, t.year, t.month) AS INT) AS rn
        |  FROM fact_carbon_intensity f
        |  JOIN dim_region r ON r.region_id = f.region_id
        |  JOIN dim_time t ON t.time_id = f.time_id
        |)
        |SELECT * FROM ranked WHERE rn <= 5 ORDER BY region_name, rn""".stripMargin,
      Analysis.q3TopIntensityMonths(star))
  }

  test("Q4 avg per source: SQL text == DataFrame pipeline") {
    sqlMatchesDf(
      """SELECT s.source_name,
        |       ROUND(AVG(f.avg_consumption_mwh), 2) AS avg_monthly_consumption_mwh
        |FROM fact_energy_monthly f
        |JOIN dim_energy_source s ON s.source_id = f.source_id
        |GROUP BY s.source_name
        |ORDER BY avg_monthly_consumption_mwh DESC NULLS LAST""".stripMargin,
      Analysis.q4AvgConsumptionPerSource(star))
  }

  test("Q6 null audit: SQL text == DataFrame pipeline") {
    sqlMatchesDf(
      "SELECT COUNT(*) AS null_intensity_rows FROM fact_carbon_intensity WHERE co2_per_mwh IS NULL",
      Analysis.q6NullIntensityCount(star))
  }
}
