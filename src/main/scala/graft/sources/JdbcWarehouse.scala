package graft.sources

import java.sql.{Connection, DriverManager}
import graft.pipeline.EnergyStar

/** Transactional warehouse load (M5) — the reference wraps its entire
  * star-schema load in ONE database transaction (`load_to_postgres.py:128`
  * `engine.begin()`): stage every frame with `to_sql`, then set-based SQL
  * upserts run INSIDE the database, all-or-nothing. This is that shape on
  * embedded Derby: Spark JDBC writes the staging tables (scratch,
  * full-replace, outside the transaction — exactly like `to_sql`), then a
  * single connection with autoCommit off MERGEs staging into the
  * warehouse tables and commits, rolling back wholesale on any failure.
  *
  * MERGE covers both reference upsert forms in one statement per table:
  * WHEN NOT MATCHED INSERT is the dim insert-if-absent anti-join
  * (`load_to_postgres.py:29-35`), WHEN MATCHED UPDATE + NOT MATCHED
  * INSERT is the fact `INSERT ... ON CONFLICT DO UPDATE`
  * (`load_to_postgres.py:74-85`).
  *
  * Scale note: the driver-side connection executes set-based statements
  * only — no per-row loops; row volume stays inside the database. The
  * warehouse tables here are dims and monthly aggregates (thousands of
  * rows — the reference's exact payload); 100 TB fact data stays in
  * parquet (`EnergyStar`), where Spark IS the warehouse.
  */
object JdbcWarehouse {

  /** One warehouse transaction: autoCommit off, commit on success,
    * rollback on any failure (M5, `load_to_postgres.py:128`).
    */
  def inTransaction[A](url: String)(body: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val out = body(conn)
      conn.commit()
      out
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        throw e
    } finally conn.close()
  }

  /** Spark's JDBC writer creates case-sensitive lowercase column names;
    * Derby uppercases unquoted identifiers — so every column reference
    * is quoted.
    */
  private def q(c: String) = "\"" + c + "\""

  private def columnsOf(conn: Connection, table: String): Seq[String] = {
    val rs = conn.createStatement().executeQuery(s"SELECT * FROM $table WHERE 1=0")
    val md = rs.getMetaData
    (1 to md.getColumnCount).map(md.getColumnName).toSeq
  }

  /** Create the warehouse table with the staging table's schema if it
    * doesn't exist yet (Derby has no IF NOT EXISTS; X0Y32 = exists).
    */
  private def ensureTable(conn: Connection, target: String, staging: String): Unit =
    try {
      conn.createStatement().executeUpdate(
        s"CREATE TABLE $target AS SELECT * FROM $staging WITH NO DATA")
      ()
    } catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => () }

  /** Set-based upsert from staging, executed BY the database. */
  private def mergeFromStaging(conn: Connection, target: String, staging: String,
                               pk: Seq[String]): Unit = {
    val cols = columnsOf(conn, staging)
    val vals = cols.filterNot(pk.contains)
    val on = pk.map(c => s"t.${q(c)} = s.${q(c)}").mkString(" AND ")
    val matched =
      if (vals.isEmpty) ""
      else "WHEN MATCHED THEN UPDATE SET " +
        vals.map(c => s"${q(c)} = s.${q(c)}").mkString(", ") + " "
    conn.createStatement().executeUpdate(
      s"MERGE INTO $target t USING $staging s ON $on " + matched +
        s"WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")}) " +
        s"VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})")
    ()
  }

  /** (warehouse table, upsert key, staging column-type overrides).
    * Dims upsert on the natural key (the reference's UNIQUE columns,
    * `SQL/01_create_schema.sql:4,9,14,21`); facts on their composite id
    * PKs (`:33,43,52`). String keys staged as VARCHAR — Derby CLOB can't
    * sit in a MERGE ON predicate.
    */
  private val StarTables: Seq[(String, Seq[String], Option[String])] = Seq(
    ("dim_region", Seq("region_name"), Some("region_name VARCHAR(64)")),
    ("dim_energy_source", Seq("source_name"), Some("source_name VARCHAR(64)")),
    ("dim_sector", Seq("sector_name"), Some("sector_name VARCHAR(64)")),
    ("dim_time", Seq("year", "month"), None),
    ("fact_energy_monthly", Seq("region_id", "source_id", "time_id"), None),
    ("fact_emissions_monthly", Seq("region_id", "sector_id", "time_id"), None),
    ("fact_carbon_intensity", Seq("region_id", "time_id"), None))

  /** Full star load: stage all 7 frames (S5), then upsert them into the
    * warehouse in ONE transaction (M1+M2+M5). Idempotent — reloading the
    * same star is a no-op; a failure anywhere rolls back every table.
    */
  def loadStar(url: String, star: EnergyStar): Unit = {
    val frames = Map(
      "dim_region" -> star.dimRegion,
      "dim_energy_source" -> star.dimEnergySource,
      "dim_sector" -> star.dimSector,
      "dim_time" -> star.dimTime,
      "fact_energy_monthly" -> star.factEnergyMonthly,
      "fact_emissions_monthly" -> star.factEmissionsMonthly,
      "fact_carbon_intensity" -> star.factCarbonIntensity)
    StarTables.foreach { case (t, _, colTypes) =>
      JdbcStage.writeStaging(frames(t), url, s"stg_$t",
        createTableColumnTypes = colTypes)
    }
    inTransaction(url) { conn =>
      StarTables.foreach { case (t, pk, _) =>
        ensureTable(conn, t, s"stg_$t")
        mergeFromStaging(conn, t, s"stg_$t", pk)
      }
    }
  }
}
