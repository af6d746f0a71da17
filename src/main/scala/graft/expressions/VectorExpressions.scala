package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

private[expressions] object VectorTypeCheck {
  def arrayOfDouble(e: Expression, side: String, name: String): Option[TypeCheckResult] =
    e.dataType match {
      case ArrayType(DoubleType, _) => None
      case other => Some(TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double> on the $side side, got ${other.catalogString}"))
    }
}

/** Native Catalyst expressions for the vector hot path. The HOF versions
  * in graft.functions.VectorFunctions (`zip_with`+`aggregate`) are
  * CodegenFallback — interpreted per row, with an array allocation per
  * evaluation — which dominates wall-clock on O(n²) similarity joins.
  * These fuse dot/norms into ONE pass over the arrays inside whole-stage
  * codegen: no allocation, no virtual calls in the loop.
  */

/** Σ aᵢ·bᵢ over two array<double> columns (null if either side is null,
  * lengths differ, or any element is null — matching how DuckDB's list
  * functions propagate element NULLs; reading a null slot as 0.0 would
  * silently fabricate a value).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.arrayOfDouble(left, "left", prettyName)
      .orElse(VectorTypeCheck.arrayOfDouble(right, "right", prettyName))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var dot = 0.0
      var i = 0
      val n = x.numElements()
      var anyNull = false
      while (i < n && !anyNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) anyNull = true
        else {
          dot += x.getDouble(i) * y.getDouble(i)
          i += 1
        }
      }
      if (anyNull) null else dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity dot/(‖a‖·‖b‖) in one fused pass; null on zero norm,
  * length mismatch, or any null element (matching DuckDB's
  * list_cosine_similarity null propagation). Same formula shape as
  * DuckDB's list_cosine_similarity (dot / (sqrt(aa) * sqrt(bb))).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.arrayOfDouble(left, "left", prettyName)
      .orElse(VectorTypeCheck.arrayOfDouble(right, "right", prettyName))
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      val n = x.numElements()
      var anyNull = false
      while (i < n && !anyNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) anyNull = true
        else {
          val xv = x.getDouble(i)
          val yv = y.getDouble(i)
          dot += xv * yv
          na += xv * xv
          nb += yv * yv
          i += 1
        }
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (anyNull || denom == 0.0) null else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = $a.getDouble($i);
         |    final double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv;
         |    $na += $xv * $xv;
         |    $nb += $yv * $yv;
         |  }
         |  final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if (${ev.isNull} || $denom == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / $denom;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
