package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import graft.expressions.{CosineSimilarity, DotProduct, GramHashes, NfcNormalize, SimHash, ZOrder16}

/** SparkSessionExtensions hook exposing the engine's native expressions
  * to SQL users:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

object GraftExtensions {
  // SQL callers get float/int arrays coerced to array<double> for free
  private def asVec(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case _ => Cast(e, ArrayType(DoubleType))
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (args => CosineSimilarity(asVec(args(0)), asVec(args(1)))),
    "dot_product" -> (args => DotProduct(asVec(args(0)), asVec(args(1)))),
    "simhash64" -> (args => SimHash(args.head)),
    "nfc_normalize" -> (args => NfcNormalize(args.head)),
    "gram_hashes" -> (args => GramHashes(args.head)),
    "zorder16" -> (args => ZOrder16(
      Cast(args(0), LongType), Cast(args(1), LongType))))

  /** Register on an already-running session (builder extensions only
    * apply to sessions created after `withExtensions`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
