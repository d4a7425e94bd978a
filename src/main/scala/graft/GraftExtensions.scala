package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType
import graft.functions.{ArrayDotExpr, NormCdfExpr}

/** SparkSessionExtensions entry point (SURVEY §7.3 optional surface):
  * registers the engine's native expressions as SQL functions so
  * `spark.sql("SELECT norm_cdf(x) ...")` works with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("norm_cdf"),
      new ExpressionInfo(classOf[NormCdfExpr].getName, "norm_cdf"),
      (children: Seq[Expression]) => NormCdfExpr(Cast(children.head, DoubleType))),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[ArrayDotExpr].getName, "vec_dot"),
      (children: Seq[Expression]) => ArrayDotExpr(children(0), children(1))))

  // Weak keys: the guard must not pin stopped sessions (and their whole
  // sessionState) in memory for the life of the process.
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Register on an already-built session (Verify/Bench create plain
    * sessions; tests too). Idempotent AND once-per-session: re-running
    * createOrReplaceTempFunction on every query spams "function replaced"
    * warnings through a whole bench run. The check-and-register runs
    * under the session's monitor so a concurrent first use cannot observe
    * the guard set while registration is still in flight (the functions
    * are registered before ANY caller returns). */
  def register(spark: SparkSession): Unit = spark.synchronized {
    if (registered.add(spark))
      descriptors.foreach { case (id, _, builder) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          id.funcName, builder, "built-in")
      }
  }
}
