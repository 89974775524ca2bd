package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udaf
import graft.functions.aggs._

/** Column-level API for the custom aggregate functions — the analytics
  * surface the reference registers in
  * /root/reference/src/AggregateFunctions/registerAggregateFunctions.cpp
  * that has no Spark built-in. Exposed as UDAF-wrapped `Aggregator`s
  * (partial states merge associatively, so they distribute exactly like
  * built-in aggregates: map-side partial, shuffle of states, final merge).
  */
object GraftFunctions {

  /** Max funnel step reached within `windowUs` micros. Args: event time in
    * epoch micros, 1-based step index (0 = not a funnel event). */
  def window_funnel(windowUs: Long, nSteps: Int)(tsUs: Column, step: Column): Column =
    udaf(new WindowFunnelAgg(windowUs, nSteps)).apply(tsUs, step)

  /** True iff steps 1..nSteps occur in strictly increasing time order. */
  def sequence_match(nSteps: Int)(tsUs: Column, step: Column): Column =
    udaf(new SequenceMatchAgg(nSteps)).apply(tsUs, step)

  /** windowFunnel with strict_order / strict_increase modes. */
  def window_funnel_strict(windowUs: Long, nSteps: Int,
                           strictOrder: Boolean = false,
                           strictIncrease: Boolean = false)
                          (tsUs: Column, step: Column): Column =
    udaf(new WindowFunnelStrictAgg(windowUs, nSteps, strictOrder, strictIncrease))
      .apply(tsUs, step)

  /** sequenceMatch with per-transition (minUs, maxUs) time conditions —
    * the `(?t<=n)` / `(?t>=n)` pattern operators. */
  def sequence_match_time(nSteps: Int, gaps: Seq[(Long, Long)])
                         (tsUs: Column, step: Column): Column =
    udaf(new SequenceMatchTimeAgg(nSteps, gaps)).apply(tsUs, step)

  /** Count of non-overlapping step-1..nSteps chains in time order. */
  def sequence_count(nSteps: Int)(tsUs: Column, step: Column): Column =
    udaf(new SequenceCountAgg(nSteps)).apply(tsUs, step)

  /** Cohort retention over an array of per-row conditions. */
  def retention(nConds: Int)(conds: Column): Column =
    udaf(new RetentionAgg(nConds)).apply(conds)

  /** Exact distinct count up to n, else n+1. */
  def uniq_up_to(n: Int)(x: Column): Column =
    udaf(new UniqUpToAgg(n)).apply(x)

  /** Sum of positive deltas of `value` between (ts, key)-consecutive rows;
    * `key` breaks timestamp ties deterministically. */
  def delta_sum_timestamp(tsUs: Column, key: Column, value: Column): Column =
    udaf(new DeltaSumTimestampAgg).apply(tsUs, key, value)

  /** SpaceSaving top-k heavy hitters: array<struct(value, count)>. */
  def top_k(k: Int, capacity: Int)(x: Column): Column =
    udaf(new TopKAgg(k, capacity)).apply(x)

  /** SpaceSaving top-k with per-row weights. */
  def top_k_weighted(k: Int, capacity: Int)(x: Column, w: Column): Column =
    udaf(new TopKWeightedAgg(k, capacity)).apply(x, w)

  /** Boyer–Moore heavy hitter; exact when a true majority exists. */
  def any_heavy(x: Column): Column =
    udaf(new AnyHeavyAgg).apply(x)

  /** RoaringBitmap-backed exact distinct count of int keys. */
  def group_bitmap(x: Column): Column =
    udaf(new GroupBitmapAgg).apply(x)

  /** Online SGD linear regression; returns weights :+ bias. */
  def stochastic_linear_regression(lr: Double, l2: Double, batch: Int,
                                   nFeatures: Int)(y: Column, xs: Column): Column =
    udaf(new StochasticLinearRegressionAgg(lr, l2, batch, nFeatures)).apply(y, xs)

  /** Online SGD logistic regression; returns weights :+ bias. */
  def stochastic_logistic_regression(lr: Double, l2: Double, batch: Int,
                                     nFeatures: Int)(y: Column, xs: Column): Column =
    udaf(new StochasticLogisticRegressionAgg(lr, l2, batch, nFeatures)).apply(y, xs)
}
