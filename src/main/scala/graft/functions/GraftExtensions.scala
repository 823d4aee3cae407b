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
    e.injectFunction((
      new FunctionIdentifier("smc_bin"),
      new ExpressionInfo(classOf[SmcBinary].getName, "smc_bin"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SmcBinary(exprs(0), exprs(1), GraftExtensions.literalBits(exprs(2)))))
  }
}

object GraftExtensions {
  /** `smc_bin(a, b, bits)` needs its width at PLAN time (it is baked
    * into the generated code), so the third argument must be a foldable
    * integer literal. */
  private[functions] def literalBits(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    require(e.foldable, s"smc_bin: bits must be a literal, got $e")
    val v = e.eval()
    require(v != null, "smc_bin: bits must not be null")
    val bits = v.asInstanceOf[Number].intValue()
    require(bits > 0, s"smc_bin: bits must be positive, got $bits")
    bits
  }
}
