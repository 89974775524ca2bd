package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * Accumulation order is left-to-right, identical to the aggregate()
  * composition and to DuckDB's list_cosine_similarity internals, so
  * oracle hash-parity is preserved.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

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

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
