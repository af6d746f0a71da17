package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for cluster-scale runs. AQE's skew-join
  * splitting handles most cases at runtime; these are the explicit
  * fallbacks for the pathologies AQE can't fix (a single hot key inside
  * one task, skewed aggregation keys).
  */
object ScaleOps {

  /** Equi-join where the LEFT side has skewed key frequencies: spread
    * each hot key over `salts` shuffle partitions by salting the left
    * side with a deterministic per-row hash and replicating the right
    * side `salts`×. Result is exactly `left.join(right, keys)` — the
    * salt only changes the physical distribution.
    *
    * Cost model: right side grows `salts`×, so use for moderate `salts`
    * against a right side much smaller than the skewed left.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (keys, salt) — spreading a hot group over `salts` reducers — then
    * final-aggregate on keys. Works for any algebraic aggregate given
    * its (partial, merge) pair; the common sum/count case is provided.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Range-partitioned sort-friendly repartition for write paths: at
    * 100 TB, `orderBy` before a sink is a global sort — prefer
    * `repartitionByRange` (one shuffle, per-file ordering) when only
    * file-level clustering is needed.
    */
  def clusterBy(df: DataFrame, numPartitions: Int, cols: Column*): DataFrame =
    df.repartitionByRange(numPartitions, cols: _*)
      .sortWithinPartitions(cols: _*)
}
