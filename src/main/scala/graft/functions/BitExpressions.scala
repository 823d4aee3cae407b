package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Static kernels the generated code calls into (kept tiny and
  * branch-free so they inline). */
object BitOps {
  def popcountBytes(b: Array[Byte]): Int = {
    var s = 0
    var i = 0
    while (i < b.length) { s += java.lang.Integer.bitCount(b(i) & 0xff); i += 1 }
    s
  }

  def andPopcountBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var s = 0
    var i = 0
    while (i < n) { s += java.lang.Integer.bitCount(a(i) & b(i) & 0xff); i += 1 }
    s
  }

  /** Dice over two BinaryType CLKs — 0.0 on zero denominator
    * (`/root/reference/anonlink/similarities/_dice_python.py:113-116`). */
  def diceBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val denom = popcountBytes(a) + popcountBytes(b)
    if (denom == 0) 0.0 else 2.0 * andPopcountBytes(a, b) / denom
  }

  /** Dot product of two float arrays accumulated left-to-right in
    * double over the common prefix — the exact arithmetic the former
    * `Ann.dotUdf` used (and bit-identical to DuckDB's
    * `list_dot_product(DOUBLE[])` naive accumulation), operating
    * directly on Catalyst `ArrayData` so codegen needs no
    * serde-to-Seq per row. */
  def dotFloatArrays(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      // a null element contributes 0 (explicitly — ArrayData.getFloat
      // on a null slot would silently read garbage, not throw)
      if (!a.isNullAt(i) && !b.isNullAt(i))
        s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def xorPopcountBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var s = 0
    var i = 0
    while (i < n) { s += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1 }
    // bits beyond the shorter input count as differing? The reference
    // requires equal lengths; mirror that leniency-free by adding the
    // tail popcount of the longer side.
    val longer = if (a.length >= b.length) a else b
    var j = n
    while (j < longer.length) { s += java.lang.Integer.bitCount(longer(j) & 0xff); j += 1 }
    s
  }
}

/** S4 as a native Catalyst expression: popcount of a BinaryType column
  * with whole-stage codegen (Spark's builtin `bit_count` only covers
  * integral types). Promotion of the UDF path per SURVEY §7.5. */
case class PopcountBinary(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "popcount_bin"

  protected override def nullSafeEval(v: Any): Any =
    BitOps.popcountBytes(v.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BitOps.popcountBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): PopcountBinary =
    copy(child = newChild)
}

/** S5 as a native Catalyst expression: Dice coefficient of two
  * BinaryType CLKs, codegen-friendly (used for re-scoring explicit pair
  * lists; the batch kernel handles the quadratic stage). */
case class DiceBinary(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dice_bin"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    BitOps.diceBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitOps.diceBytes($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DiceBinary =
    copy(left = l, right = r)
}

/** Exact float-vector dot product as a native codegen expression —
  * the candidate-verify scorer of the ANN/embedding paths
  * ([[graft.ops.Ann]], [[graft.ops.Dedup.embeddingNearDup]]). Replaces
  * the former Scala UDF: same double left-to-right accumulation over
  * the common prefix, but evaluated inside whole-stage codegen with no
  * per-row Seq[Float] serde. */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_float"

  // declared input types so a mismatched column (array<double>, a
  // struct, raw binary) fails at ANALYSIS time with a readable error —
  // ArrayData.getFloat on a double array would silently misread the
  // slots as garbage floats (the former UDF at least failed on
  // deserialization). ExpectsInputTypes is private[sql] on this build,
  // so the check is spelled directly. Null ELEMENTS are allowed
  // (parquet-read array<float> is containsNull=true even when no
  // nulls exist) and handled explicitly in the kernel.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    Seq(("left", left), ("right", right)).collectFirst {
      case (side, e) if !e.dataType.isInstanceOf[ArrayType] ||
          e.dataType.asInstanceOf[ArrayType].elementType != FloatType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> inputs, but the $side argument is " +
            s"${e.dataType.catalogString} (cast(x as array<float>) to convert)")
    }.getOrElse(org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess)
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    BitOps.dotFloatArrays(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitOps.dotFloatArrays($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductFloat =
    copy(left = l, right = r)
}

/** SMC scalar over BinaryType CLKs (S6 companion of [[DiceBinary]]). */
case class SmcBinary(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "smc_bin"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    1.0 - BitOps.xorPopcountBytes(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]).toDouble / bits

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"1.0 - graft.functions.BitOps.xorPopcountBytes($a, $b) / (double) $bits")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SmcBinary =
    copy(left = l, right = r)
}

/** Column-API + SQL registration for the bit expressions. */
object BitFunctions {
  def popcount_bin(c: Column): Column = toColumn(PopcountBinary(toExpression(c)))
  def dice_bin(a: Column, b: Column): Column = toColumn(DiceBinary(toExpression(a), toExpression(b)))
  def smc_bin(a: Column, b: Column, bits: Int): Column = toColumn(SmcBinary(toExpression(a), toExpression(b), bits))
  def dot_float(a: Column, b: Column): Column = toColumn(DotProductFloat(toExpression(a), toExpression(b)))

  /** Register `popcount_bin` / `dice_bin` / `smc_bin` for SQL queries. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "popcount_bin", exprs => PopcountBinary(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dice_bin", exprs => DiceBinary(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "smc_bin", exprs =>
        SmcBinary(exprs(0), exprs(1), GraftExtensions.literalBits(exprs(2))), "scala_udf")
  }
}
