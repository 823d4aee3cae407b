package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("popcount_bin"),
      new ExpressionInfo(classOf[PopcountBinary].getName, "popcount_bin"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PopcountBinary(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("dice_bin"),
      new ExpressionInfo(classOf[DiceBinary].getName, "dice_bin"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DiceBinary(exprs(0), exprs(1))))
  }
}
