package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType
import graft.functions.NormCdfExpr

/** SparkSessionExtensions entry point (SURVEY §7.3 optional surface):
  * registers the engine's native expressions as SQL functions so
  * `spark.sql("SELECT norm_cdf(x) ...")` works with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.normCdfDescriptor)
  }
}

object GraftExtensions {
  private val normCdfDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("norm_cdf"),
    new ExpressionInfo(classOf[NormCdfExpr].getName, "norm_cdf"),
    (children: Seq[Expression]) => NormCdfExpr(Cast(children.head, DoubleType)))

  /** Register on an already-built session (Verify/Bench create plain
    * sessions; tests too). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "norm_cdf", normCdfDescriptor._3, "built-in")
}
