package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Scalar kernels over vector columns. Accumulation is in index order,
  * exactly like the `zip_with`+`aggregate` fold these replace, so
  * swapping implementations cannot move a result by even one ulp (the
  * DuckDB oracle tolerance argument stays as documented in Similarity).
  */
object VectorOps {
  /** Null-propagating dot over float arrays, matching
    * `zip_with`+`aggregate` exactly: unequal lengths (zip_with pads with
    * null) or any null element make the fold NULL, so they make this
    * NULL too. Returns a boxed Double or null. */
  def dotFloatOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** The double-array twin (PQ residual/reconstruction vectors are
    * double-typed derived data, not raw float embeddings). */
  def dotDoubleOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Native dot product over two array<float> or two array<double> columns
  * (SURVEY §7.3 "custom Expression beats UDF"): one kernel call per row
  * inside whole-stage codegen instead of materializing a zipped
  * intermediate array and folding it with higher-order-function lambdas —
  * the hot inner loop of every similarity-search query. Registered as SQL
  * `vec_dot` by [[graft.GraftExtensions]].
  */
case class ArrayDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(FloatType, DoubleType).exists(t =>
      Seq(left, right).forall(_.dataType match {
        case ArrayType(`t`, _) => true
        case _ => false
      }))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_dot requires two array<float> or two array<double> inputs")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // Null elements / length mismatch produce NULL even from non-null inputs.
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any =
    if (isFloat)
      VectorOps.dotFloatOrNull(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    else
      VectorOps.dotDoubleOrNull(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "dotFloatOrNull" else "dotDoubleOrNull"
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val res = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $res = graft.functions.VectorOps.$fn($l, $r);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotExpr =
    copy(left = newLeft, right = newRight)
}
