package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.planning.PhysicalAggregation
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.internal.SQLConf

/** Shuffle-first ("complete mode") aggregation for high-cardinality
  * group-bys.
  *
  * Spark always plans partial-then-final hash aggregation. When the
  * number of groups approaches the number of rows (GROUP BY UserID, URL,
  * SearchPhrase ... on a web-analytics table), the partial step reduces
  * almost nothing yet builds a near-full hash map per map task — for a
  * 10 M-row table with 1 M groups the partial maps hold ~8 M entries in
  * aggregate and the shuffle still carries ~8 M rows. The reference
  * engine's distributed plan for this shape is shuffle-by-key then one
  * aggregation pass (daisy: `src/Interpreters/Aggregator.cpp` two-level
  * merge; its per-shard "WithMergeableState" stage is skipped for
  * single-stage local plans).
  *
  * This strategy plans the same thing on Spark: exchange on the grouping
  * key, then a single Complete-mode HashAggregateExec. Each reduce task
  * owns its key range, so the map holds groups/numPartitions entries and
  * every input row is hashed exactly once. At 100 TB the trade is
  * identical — shuffle rows (uncombined) vs per-mapper map build; for
  * near-unique keys the former is strictly cheaper. Low-cardinality
  * group-bys should keep partial aggregation (massive combine ratio), so
  * the strategy only fires when `spark.graft.skipPartialAgg` is true —
  * an engine with column NDV statistics would flip this automatically;
  * the session conf is the explicit stand-in.
  *
  * Falls through (Nil) for distinct/filtered aggregates, aggregates with
  * no grouping keys, and buffer types HashAggregateExec can't hold in
  * UnsafeRow — Spark's built-in strategy then plans those as usual.
  */
object SkipPartialAgg extends SparkStrategy {
  val ConfKey = "spark.graft.skipPartialAgg"

  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(SkipPartialAgg))
      spark.experimental.extraStrategies =
        SkipPartialAgg +: spark.experimental.extraStrategies

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PhysicalAggregation(groupingExprs, aggExprs, resultExprs, child)
        if SQLConf.get.getConfString(ConfKey, "false") == "true" &&
          groupingExprs.nonEmpty && aggExprs.nonEmpty &&
          aggExprs.forall(ae => !ae.isDistinct && ae.filter.isEmpty) &&
          Aggregate.supportsHashAggregate(
            aggExprs.flatMap(_.aggregateFunction.aggBufferAttributes),
            groupingExprs) =>
      val complete = aggExprs.map(_.copy(mode = Complete))
      HashAggregateExec(
        requiredChildDistributionExpressions =
          Some(groupingExprs.map(_.toAttribute)),
        isStreaming = false,
        numShufflePartitions = None,
        groupingExpressions = groupingExprs,
        aggregateExpressions = complete,
        aggregateAttributes = complete.map(_.resultAttribute),
        initialInputBufferOffset = 0,
        resultExpressions = resultExprs,
        child = planLater(child)) :: Nil
    case _ => Nil
  }
}
