package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.storage.StorageLevel

/** Alternate-layout materialized projections with automatic query
  * routing.
  *
  * The reference's answer to "this table is sorted for date-range scans
  * but my heaviest query groups by UserID" is a materialized view with a
  * different primary key (`src/Storages/StorageMaterializedView.cpp`) —
  * same rows, alternate physical order, kept alongside the base table.
  * graft's Spark-native equivalent: a cached narrow column subset
  * hash-partitioned by the hot grouping key. An aggregation whose keys
  * cover the projection's partitioning key can then run WITHOUT a
  * shuffle — the exchange that dominates high-cardinality group-bys on
  * the base layout disappears (HashPartitioning on a subset of the
  * grouping keys satisfies the aggregate's ClusteredDistribution), and
  * [[SkipPartialAgg]]'s Complete-mode plan degenerates to scan → one
  * hash-agg pass per co-located partition.
  *
  * Routing is the optimizer's job, not the query author's (the user
  * keeps writing `GROUP BY UserID` against the base table):
  * [[Projections.RouteToProjection]] rewrites an [[Aggregate]] whose
  * referenced columns are all carried by a registered projection of the
  * scanned relation AND whose grouping keys cover the projection's
  * partition key, swapping the base relation leaf for the projection
  * (with an alias layer preserving the original attribute ids).
  *
  * At 100 TB the same trade holds — a projection is one extra stored
  * copy of the hot columns, bucketed by the hot key at write time, and
  * every aggregation it serves saves a full-table shuffle. Projections
  * are point-in-time snapshots of the base data (the reference's MVs
  * have the same freshness contract, refreshed on ingest).
  */
object Projections {

  private final case class ProjDef(
      baseLeafCanonical: LogicalPlan,
      partitionCols: Seq[String],         // lower-cased
      carried: Set[String],               // lower-cased
      projPlan: LogicalPlan,              // optimized (InMemoryRelation) plan
      projDf: DataFrame)

  private val registry = new java.util.concurrent.CopyOnWriteArrayList[ProjDef]()

  /** Raw (NOT canonicalized) single leaf — the routing rule replaces the
    * leaf by reference (`eq`), so the original node is required here;
    * [[TableStats.leafOf]] is the canonicalizing variant for map keys. */
  private def leafOf(plan: LogicalPlan): Option[LogicalPlan] =
    plan.collectLeaves() match {
      case Seq(one) => Some(one)
      case _ => None
    }

  /** Build, cache and register a projection of `base`: `columns`,
    * hash-partitioned on `partitionCols`. Returns the projection
    * DataFrame (already materialized). Re-registering the same
    * (base, partitioning, columns) triple returns the existing one. */
  def register(spark: SparkSession, base: DataFrame,
               partitionCols: Seq[String], columns: Seq[String]): DataFrame = {
    val pcLower = partitionCols.map(_.toLowerCase)
    val carried = columns.map(_.toLowerCase).toSet
    require(pcLower.forall(carried), "partition columns must be carried")
    val baseLeaf = leafOf(base.queryExecution.optimizedPlan)
      .getOrElse(throw new IllegalArgumentException(
        "Projections.register: base must scan a single relation"))
    registry.asScala.find { p =>
      p.baseLeafCanonical == baseLeaf.canonicalized &&
        p.partitionCols == pcLower && p.carried == carried
    }.foreach(p => return p.projDf)
    val proj = base
      .select(columns.map(col): _*)
      .repartition(partitionCols.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    proj.count() // materialize so the optimized plan below is the cache scan
    val projPlan = proj.queryExecution.optimizedPlan
    registry.add(ProjDef(baseLeaf.canonicalized, pcLower, carried, projPlan, proj))
    // a projection has the same rows as its base, so its per-column NDV
    // and row count are the base's — inherit them so SkipPartialAgg's
    // leaf-scoped stats decision still fires on routed plans.
    leafOf(projPlan).foreach(pl => TableStats.inherit(baseLeaf, pl, carried))
    install(spark)
    proj
  }

  /** Unpersist and drop every registered projection. */
  def clear(): Unit = {
    registry.forEach(p => p.projDf.unpersist(false): Unit)
    registry.clear()
  }

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RouteToProjection))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RouteToProjection

  /** Grouping keys that are plain columns (directly or via alias). */
  private def groupingAttrNames(exprs: Seq[org.apache.spark.sql.catalyst
      .expressions.Expression]): Set[String] =
    exprs.collect {
      case ar: AttributeReference => ar.name.toLowerCase
      case Alias(ar: AttributeReference, _) => ar.name.toLowerCase
    }.toSet

  object RouteToProjection extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty) return plan
      plan.transformDown {
        case agg @ Aggregate(groupingExprs, _, child, _) =>
          route(agg, groupingExprs, child).getOrElse(agg)
      }
    }

    private def route(agg: Aggregate,
                      groupingExprs: Seq[org.apache.spark.sql.catalyst
                        .expressions.Expression],
                      child: LogicalPlan): Option[LogicalPlan] = {
      val leaf = leafOf(child).getOrElse(return None)
      val gNames = groupingAttrNames(groupingExprs)
      // every attribute referenced above the leaf (in the agg's own
      // expressions or anywhere in the child chain) must be carried
      val refs = AttributeSet(
        agg.expressions.flatMap(_.references) ++
          child.collect { case n => n.references }.flatten)
      val needed: Seq[Attribute] = leaf.output.filter(refs.contains)
      val neededNames = needed.map(_.name.toLowerCase).toSet
      // The projection is derived from the base DataFrame's lineage, so
      // its output attributes carry the SAME exprIds as the base leaf's
      // — the swap needs no alias layer (and a self-alias breaks the
      // in-memory scan planner). Route only when every needed attribute
      // is present by id; a projection registered from an unrelated
      // lineage simply never routes.
      val chosen = registry.asScala.find { p =>
        p.baseLeafCanonical == leaf.canonicalized &&
          p.partitionCols.forall(gNames) &&
          neededNames.subsetOf(p.carried) &&
          needed.forall(o => p.projPlan.outputSet.contains(o))
      }.getOrElse(return None)
      val newLeaf = Project(needed, chosen.projPlan)
      Some(agg.copy(child = child.transformUp {
        case l if l eq leaf => newLeaf
      }))
    }
  }
}
