package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Morton (z-order) interleave of two 16-bit coordinates as a NATIVE
  * codegen'd expression: bit i of x lands at bit 2i, bit i of y at
  * 2i+1.
  *
  * Why not compose it from bitwise `Column` arithmetic? The 4-step
  * spread ladder references each intermediate twice, and Catalyst's
  * projection collapsing inlines expression trees BY VALUE — the
  * composed form duplicates the domain guard and every ladder step
  * ~16× per side in the optimized plan (measured; whole-stage codegen's
  * subexpression elimination claws some back, but the interpreted
  * fallback and the plan itself stay exponential). A native expression
  * evaluates each step exactly once in both eval and codegen.
  *
  * The [0, 2^16) domain guard raises — a silently masked coordinate
  * would fold distant points onto the same cell, corrupting every
  * downstream min/max bound (same loud-precondition discipline as
  * EventsOps.packedOrderKey).
  */
case class ZOrder16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder16"

  override def nullSafeEval(xv: Any, yv: Any): Any = {
    val x = xv.asInstanceOf[Long]
    val y = yv.asInstanceOf[Long]
    if (x < 0L || x > 0xFFFFL) ZOrder16.outOfDomain(x)
    if (y < 0L || y > 0xFFFFL) ZOrder16.outOfDomain(y)
    ZOrder16.spread(x) | (ZOrder16.spread(y) << 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val (gx, gy) = (ctx.freshName("gx"), ctx.freshName("gy"))
      val cls = ZOrder16.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |long $gx = $x;
         |long $gy = $y;
         |if ($gx < 0L || $gx > 65535L) $cls.outOfDomain($gx);
         |if ($gy < 0L || $gy > 65535L) $cls.outOfDomain($gy);
         |$gx = ($gx | ($gx << 8)) & 0x00FF00FFL;
         |$gx = ($gx | ($gx << 4)) & 0x0F0F0F0FL;
         |$gx = ($gx | ($gx << 2)) & 0x33333333L;
         |$gx = ($gx | ($gx << 1)) & 0x55555555L;
         |$gy = ($gy | ($gy << 8)) & 0x00FF00FFL;
         |$gy = ($gy | ($gy << 4)) & 0x0F0F0F0FL;
         |$gy = ($gy | ($gy << 2)) & 0x33333333L;
         |$gy = ($gy | ($gy << 1)) & 0x55555555L;
         |${ev.value} = $gx | ($gy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder16 =
    copy(left = newLeft, right = newRight)
}

object ZOrder16 {
  /** Spread the low 16 bits to even positions (0b_b2b1b0 -> 0b_0b2_0b1_0b0). */
  def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Shared by eval and generated code so the message stays identical. */
  def outOfDomain(v: Long): Nothing =
    throw new IllegalArgumentException(
      s"zorder16 input outside [0, 2^16): $v")
}
