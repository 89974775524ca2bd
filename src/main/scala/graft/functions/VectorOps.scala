package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** dot_arr(a, b) — dot product of two numeric arrays (float or double),
  * accumulated in double, as a native Catalyst expression.
  *
  * Exists because the composable form
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` evaluates higher-order
  * lambdas interpretively per element — at 2M candidate pairs × 64 dims
  * that interpretation dominated the similarity benchmarks by ~100×.
  * This is the SURVEY §2.9 preference order in action: when the
  * composition is too slow, drop to a custom Expression (primitive loop,
  * no allocation), not a UDF.
  *
  * Codegen emits a static call to [[DotProduct.compute]] (the XxHash64
  * pattern) so pair-explosion hot paths stay inside WholeStageCodegen —
  * the r2 CodegenFallback boxed per row and split the stage.
  *
  * Accumulation order is left-to-right, identical to the aggregate()
  * composition and to DuckDB's list_cosine_similarity internals, so
  * oracle hash-parity is preserved.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(t, _) => t
    case _ => null
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    (elemType(left), elemType(right)) match {
      case (FloatType | DoubleType, FloatType | DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_arr requires array<float|double>, got ${left.dataType}, ${right.dataType}")
    }
  }

  @transient private lazy val leftIsFloat = elemType(left) == FloatType
  @transient private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(DotProduct.compute(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.compute($a, $b, $leftIsFloat, $rightIsFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Static kernel shared by eval and generated code. */
  def compute(a: ArrayData, b: ArrayData,
              leftFloat: Boolean, rightFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
