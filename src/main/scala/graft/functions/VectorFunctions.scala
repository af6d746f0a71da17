package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, built from codegen'd
  * higher-order functions (`zip_with`/`aggregate`) — no UDFs, so Catalyst
  * sees through the expressions and the work stays in the JVM with no
  * serialization boundary.
  *
  * Callers should cast `array<float>` columns to `array<double>` first
  * (`c.cast("array<double>")`) so accumulation happens in double and
  * matches the DuckDB oracle's `CAST(x AS DOUBLE[])` exactly.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — left-to-right accumulation, deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with a null guard on zero norms. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0, lit(null)).otherwise(dot(a, b) / denom)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))
}
