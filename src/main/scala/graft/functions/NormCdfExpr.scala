package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Shared scalar kernel for Φ(x). MUST stay formula-identical (same ops,
  * same order, same constants) to `ColFns.normCdf` / `ColFns.normCdfSql`
  * so all three paths — expression-tree, codegen'd native expression, and
  * the DuckDB oracle — produce bitwise-equal doubles. */
object NormCdf {
  def compute(x: Double): Double = {
    val y = x / math.sqrt(2.0)
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(y))
    val poly = t * (0.254829592 +
      t * (-0.284496736 +
        t * (1.421413741 +
          t * (-1.453152027 + t * 1.061405429))))
    val erfAbs = 1.0 - poly * math.exp(-(y * y))
    val erf = if (x >= 0) erfAbs else -erfAbs
    0.5 * (1.0 + erf)
  }
}

/** Native Catalyst expression for the reference's norm.cdf squash
  * (strategy.py:139-150): a single virtual call inside whole-stage
  * codegen instead of the ~25-node expression tree `ColFns.normCdf`
  * builds — SURVEY §7.3's "custom Expression beats UDF" path. Registered
  * as SQL `norm_cdf` by [[graft.GraftExtensions]].
  */
case class NormCdfExpr(child: Expression) extends UnaryExpression {
  // AbstractDataType (and so ImplicitCastInputTypes) is private[sql] in
  // Spark 4 — the registration site casts the child to DOUBLE instead.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"norm_cdf requires DOUBLE input, got ${child.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm_cdf"

  override protected def nullSafeEval(input: Any): Any =
    NormCdf.compute(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormCdf.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormCdfExpr =
    copy(child = newChild)
}
