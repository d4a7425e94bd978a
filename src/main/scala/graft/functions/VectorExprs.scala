package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Scalar kernels over float-vector columns. Accumulation is in index
  * order, exactly like the `zip_with`+`aggregate` fold these replace, so
  * swapping implementations cannot move a result by even one ulp (the
  * DuckDB oracle tolerance argument stays as documented in Similarity).
  */
object VectorOps {
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** Native dot product over two array<float> columns (SURVEY §7.3 "custom
  * Expression beats UDF"): one kernel call per row inside whole-stage
  * codegen instead of materializing a zipped intermediate array and
  * folding it with higher-order-function lambdas — the hot inner loop of
  * every similarity-search query. Registered as SQL `vec_dot` by
  * [[graft.GraftExtensions]].
  */
case class ArrayDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("vec_dot requires array<float> inputs")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.dotFloat(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.VectorOps.dotFloat($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotExpr =
    copy(left = newLeft, right = newRight)
}
