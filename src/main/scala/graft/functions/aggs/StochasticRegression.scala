package graft.functions.aggs

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** stochasticLinearRegression / stochasticLogisticRegression (reference:
  * `src/AggregateFunctions/AggregateFunctionMLMethod.cpp` — online SGD
  * with mini-batches; distributed merge averages the models weighted by
  * rows seen, exactly the reference's `merge()` proportional-update).
  *
  * State = weights ⊕ bias ⊕ mini-batch gradient accumulator ⊕ counts:
  * O(features), mergeable, no row buffering — the aggregate streams any
  * number of rows through constant memory, so it distributes like any
  * other partial-aggregable function. SGD is order-dependent, so exact
  * results vary with partitioning (same as the reference across threads);
  * the spec checks convergence on controlled data instead of bit
  * equality, and the registered query is rows-only checked.
  */
final case class SgdState(weights: Array[Double], bias: Double,
                          grad: Array[Double], gradBias: Double,
                          inBatch: Long, seen: Long)

abstract class SgdRegressionAgg(lr: Double, l2: Double, batch: Int, nFeatures: Int)
    extends Aggregator[(Double, Seq[Double]), SgdState, Seq[Double]]
    with Serializable {

  /** dLoss/dPred for prediction `p` against target `y`. */
  protected def lossGrad(p: Double, y: Double): Double

  def zero: SgdState =
    SgdState(new Array[Double](nFeatures), 0.0,
      new Array[Double](nFeatures), 0.0, 0L, 0L)

  private def applyBatch(s: SgdState): SgdState = {
    val n = s.inBatch.toDouble
    val w = s.weights.clone()
    var i = 0
    while (i < nFeatures) {
      w(i) -= lr * (s.grad(i) / n + l2 * w(i))
      i += 1
    }
    SgdState(w, s.bias - lr * s.gradBias / n,
      new Array[Double](nFeatures), 0.0, 0L, s.seen)
  }

  def reduce(s0: SgdState, row: (Double, Seq[Double])): SgdState = {
    val (y, xs) = row
    var p = s0.bias
    var i = 0
    while (i < nFeatures) { p += s0.weights(i) * xs(i); i += 1 }
    val g = lossGrad(p, y)
    val grad = s0.grad.clone()
    i = 0
    while (i < nFeatures) { grad(i) += g * xs(i); i += 1 }
    val s1 = SgdState(s0.weights, s0.bias, grad, s0.gradBias + g,
      s0.inBatch + 1, s0.seen + 1)
    if (s1.inBatch >= batch) applyBatch(s1) else s1
  }

  def merge(a0: SgdState, b0: SgdState): SgdState = {
    val a = if (a0.inBatch > 0) applyBatch(a0) else a0
    val b = if (b0.inBatch > 0) applyBatch(b0) else b0
    if (a.seen == 0) b
    else if (b.seen == 0) a
    else {
      // model averaging weighted by rows seen (the reference's merge)
      val fa = a.seen.toDouble / (a.seen + b.seen)
      val fb = 1.0 - fa
      val w = new Array[Double](nFeatures)
      var i = 0
      while (i < nFeatures) { w(i) = a.weights(i) * fa + b.weights(i) * fb; i += 1 }
      SgdState(w, a.bias * fa + b.bias * fb,
        new Array[Double](nFeatures), 0.0, 0L, a.seen + b.seen)
    }
  }

  def finish(s0: SgdState): Seq[Double] = {
    val s = if (s0.inBatch > 0) applyBatch(s0) else s0
    s.weights.toVector :+ s.bias
  }

  def bufferEncoder: Encoder[SgdState] = Encoders.product[SgdState]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Squared loss: dL/dp = p - y. */
class StochasticLinearRegressionAgg(lr: Double, l2: Double, batch: Int, nFeatures: Int)
    extends SgdRegressionAgg(lr, l2, batch, nFeatures) {
  protected def lossGrad(p: Double, y: Double): Double = p - y
}

/** Log loss on labels in {0,1}: dL/dp = sigmoid(p) - y. */
class StochasticLogisticRegressionAgg(lr: Double, l2: Double, batch: Int, nFeatures: Int)
    extends SgdRegressionAgg(lr, l2, batch, nFeatures) {
  protected def lossGrad(p: Double, y: Double): Double =
    1.0 / (1.0 + math.exp(-p)) - y
}
