package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling 8-gram polynomial hash: for an ASCII string c of n
  * bytes, the array [h_1 … h_{n−7}] with
  * h_p = (Σ_{o<8} byte(c, p+o) · 127^{7−o}) mod 2^40 — exactly the
  * per-gram value Winnowing/ExactSubstr compute (Winnowing.PolyCoef),
  * byte-for-byte, so swapping it under q155/q171/q174 changes no
  * answer and the DuckDB oracles replay unchanged.
  *
  * Why native: the HOF formulation (split → per-char ascii transform →
  * transform(sequence) with 8 element_at calls per position) walks a
  * boxed array object graph per gram — the r15 profile showed the gram
  * stage dominating q155. This is ONE pass over the raw UTF8String
  * bytes with a ROLLING update per position
  * (h' = (h − b_p·127⁷)·127 + b_{p+8}, O(n) total instead of O(n·k)):
  * Java long arithmetic wraps mod 2^64, and 2^40 | 2^64 makes the
  * low-40-bit mask at emission exact regardless of wrap or sign.
  *
  * Contract: BYTE-level polynomial. For the [a-z0-9] canon the callers
  * feed it (bytes ≡ code points ≡ `ascii()`), this equals the
  * character polynomial the oracle replays; on non-ASCII input it
  * would diverge from `ascii()` semantics — the callers' canon step is
  * the guard, and the spec pins native ≡ HOF on canon inputs.
  */
case class GramHashes(child: Expression) extends UnaryExpression {
  import GramHashes._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    new GenericArrayData(hashes(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      s"""
         |final byte[] $bytes = $c.getBytes();
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.GramHashes.hashes($bytes));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  private val K = 8
  private val Base = 127L
  /** 127^7 — the leading coefficient removed by the rolling update. */
  private val TopCoef = 532875860165503L
  private val Mask = (1L << 40) - 1

  /** Shared by interpreted eval and generated code (the generated class
    * calls this static method — the loop is identical either way, and
    * one implementation can't drift from the other). */
  def hashes(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length
    val m = n - (K - 1)
    if (m <= 0) return Array.emptyLongArray
    val out = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < K) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    out(0) = h & Mask
    var p = 1
    while (p < m) {
      h = (h - (bytes(p - 1) & 0xffL) * TopCoef) * Base + (bytes(p + K - 1) & 0xffL)
      out(p) = h & Mask
      p += 1
    }
    out
  }
}
