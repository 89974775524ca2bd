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
  * every aggregation it serves saves a full-table shuffle.
  *
  * Freshness follows the reference's materialized views, which are
  * refreshed BY the insert path (`src/Storages/StorageMaterializedView
  * .cpp` — every block written to the base table is pushed through the
  * view's pipeline): each ingest that appends to a file-backed base
  * table calls [[invalidatePath]], which re-lists the base's file index
  * and rebuilds every projection registered over it, so routed queries
  * see exactly what a fresh scan of the base sees. Bases that are
  * in-memory caches define their own snapshot — a projection over a
  * cached base is exactly as fresh as the cache, never staler.
  */
object Projections {

  private final case class ProjDef(
      baseLeafCanonical: LogicalPlan,
      partitionCols: Seq[String],         // lower-cased
      carried: Set[String],               // lower-cased
      projPlan: LogicalPlan,              // optimized (InMemoryRelation) plan
      projDf: DataFrame,
      base: DataFrame,                    // lineage holder for rebuilds
      columnsOrdered: Seq[String],        // register() args, for rebuilds
      partitionColsOrdered: Seq[String],
      basePaths: Set[String])             // normalized file-source roots

  private val registry = new java.util.concurrent.CopyOnWriteArrayList[ProjDef]()
  // guards the find-or-build in register() and the rebuild in
  // invalidatePath(); routing only reads the COW list, lock-free
  private val lock = new Object

  /** Raw (NOT canonicalized) single leaf — the routing rule replaces the
    * leaf by reference (`eq`), so the original node is required here;
    * [[TableStats.leafOf]] is the canonicalizing variant for map keys. */
  private def leafOf(plan: LogicalPlan): Option[LogicalPlan] =
    plan.collectLeaves() match {
      case Seq(one) => Some(one)
      case _ => None
    }

  /** File-source root paths scanned by `df`, scheme-stripped so callers
    * can invalidate by plain local path. */
  private def rootPathsOf(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath)
          case _ => Nil
        }
    }.flatten.toSet

  /** Materialize one projection build: narrow select, hash-repartition
    * on the hot key, cache, and force so the captured optimized plan is
    * the cache scan. Shared by register() and the refresh path. */
  private def build(base: DataFrame, partitionCols: Seq[String],
                    columns: Seq[String]): (LogicalPlan, DataFrame) = {
    val proj = base
      .select(columns.map(col): _*)
      .repartition(partitionCols.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    proj.count()
    (proj.queryExecution.optimizedPlan, proj)
  }

  /** Build, cache and register a projection of `base`: `columns`,
    * hash-partitioned on `partitionCols`. Returns the projection
    * DataFrame (already materialized). Re-registering the same
    * (base, partitioning, columns) triple returns the existing one;
    * concurrent registrations of the same triple build it once. */
  def register(spark: SparkSession, base: DataFrame,
               partitionCols: Seq[String], columns: Seq[String]): DataFrame =
    lock.synchronized {
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
      val (projPlan, proj) = build(base, partitionCols, columns)
      registry.add(ProjDef(baseLeaf.canonicalized, pcLower, carried, projPlan,
        proj, base, columns, partitionCols, rootPathsOf(base)))
      // a projection has the same rows as its base, so its per-column NDV
      // and row count are the base's — inherit them (by attribute
      // identity: the projection keeps the base's exprIds) so
      // SkipPartialAgg's leaf-scoped stats decision fires on routed
      // plans too.
      leafOf(projPlan).foreach(pl =>
        TableStats.inherit(baseLeaf, pl, projPlan.output))
      install(spark)
      proj
    }

  /** Insert-triggered projection refresh — the ingest paths (Catalog
    * ingest/ingestRaw, WalCommitter.commitBatch) call this after
    * appending files under `path`. Every projection whose base scans
    * that path is dropped and rebuilt: the base's file index is
    * re-listed first (same mechanism as `spark.catalog.refreshByPath`),
    * so both the rebuilt projection and any later un-routed scan of the
    * same base lineage see the appended rows. */
  def invalidatePath(path: String): Unit = lock.synchronized {
    if (registry.isEmpty) return
    val target = new org.apache.hadoop.fs.Path(path).toUri.getPath
    registry.asScala.zipWithIndex.foreach { case (p, i) =>
      if (p.basePaths.contains(target)) {
        p.projDf.unpersist(false)
        p.base.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.refresh()
              case _ =>
            }
          case _ =>
        }
        val (projPlan, proj) =
          build(p.base, p.partitionColsOrdered, p.columnsOrdered)
        registry.set(i, p.copy(projPlan = projPlan, projDf = proj))
        for (bl <- leafOf(p.base.queryExecution.optimizedPlan);
             pl <- leafOf(projPlan))
          TableStats.inherit(bl, pl, projPlan.output)
      }
    }
  }

  /** Number of registered projections (spec hook). */
  private[graft] def registeredCount: Int = registry.size()

  /** Unpersist and drop every registered projection. */
  def clear(): Unit = lock.synchronized {
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
