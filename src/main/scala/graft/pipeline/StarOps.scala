package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Generic star-schema maintenance operators (reference
  * `src/30_load/load_to_postgres.py` + `SQL/01_create_schema.sql`),
  * expressed as pure DataFrame transforms — the reference's
  * staging-table/dict round-trips collapse into joins inside one plan.
  *
  * Surrogate keys are `row_number` over sorted natural keys: deterministic
  * on any cluster (SURVEY §7.4.5) — `monotonically_increasing_id` is not.
  * The global window is only ever applied to dims (small by definition);
  * facts carry the keys via broadcast joins.
  */
object StarOps {

  /** Global-ordering window for a provably tiny frame (distinct dim
    * values — bounded by dim cardinality, not data volume). The single
    * partition is by DESIGN here, and WindowExec's scale warning for it
    * is noise: the harness mains silence that one logger
    * (graft.Logs.silenceTinyWindowWarning). Partitioning by a constant
    * does NOT avoid the warning — the optimizer folds a constant
    * partition spec away before WindowExec sees it (bench logs proved
    * it), so this is the plain unpartitioned window it always
    * effectively was.
    */
  def tinyGlobalWindow(cols: org.apache.spark.sql.Column*)
      : org.apache.spark.sql.expressions.WindowSpec =
    Window.orderBy(cols: _*)

  /** Build a dimension: distinct natural key(s) → dense surrogate ids
    * (M3/D2/O3, load_to_postgres.py:19-26).
    */
  def buildDim(df: DataFrame, idCol: String, naturalKeys: String*): DataFrame =
    df.select(naturalKeys.map(col): _*).na.drop().distinct()
      .withColumn(idCol,
        row_number().over(tinyGlobalWindow(naturalKeys.map(col): _*)).cast("int"))

  /** Dim upsert — insert-if-absent with ids continuing after the current
    * max (M1, load_to_postgres.py:19-56). Idempotent: re-upserting the
    * same values is a no-op.
    */
  def upsertDim(existing: DataFrame, incoming: DataFrame,
                idCol: String, naturalKeys: String*): DataFrame = {
    val newVals = incoming.select(naturalKeys.map(col): _*).na.drop().distinct()
      .join(existing, naturalKeys, "left_anti")
      .withColumn("__rid",
        row_number().over(tinyGlobalWindow(naturalKeys.map(col): _*)))
    val maxId = existing.agg(coalesce(max(col(idCol)), lit(0)).as("__max_id"))
    val appended = newVals.crossJoin(broadcast(maxId))
      .select((naturalKeys.map(col) :+
        (col("__max_id") + col("__rid")).cast("int").as(idCol)): _*)
    existing.select((naturalKeys.map(col) :+ col(idCol)): _*).unionByName(appended)
  }

  /** Fact upsert — insert-or-update on the composite PK (M2,
    * load_to_postgres.py:71-117 `INSERT ... ON CONFLICT DO UPDATE`).
    * Full-outer join + per-column coalesce: deterministic (unlike
    * `union.dropDuplicates(pk)`, which keeps an arbitrary row) and
    * idempotent. At scale this is one shuffle on the PK; AQE handles
    * skew.
    */
  def upsertFact(existing: DataFrame, updates: DataFrame, pk: Seq[String]): DataFrame = {
    val valCols = existing.columns.filterNot(pk.contains).toSeq
    existing.as("e").join(updates.as("u"), pk, "full_outer")
      .select((pk.map(col) ++ valCols.map(c =>
        coalesce(col(s"u.$c"), col(s"e.$c")).as(c))): _*)
  }

  /** Fail-fast null validation (M4, load_to_postgres.py:184-187): raise
    * if any of the given columns is null anywhere. One cheap job (limit 1
    * short-circuits the scan).
    */
  def assertNoNulls(df: DataFrame, cols: Seq[String], context: String): Unit = {
    val pred = cols.map(col(_).isNull).reduce(_ || _)
    if (!df.filter(pred).isEmpty)
      throw new IllegalStateException(
        s"$context: NULL values in key/measure columns ${cols.mkString(", ")}")
  }
}
