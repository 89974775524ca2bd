package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** Lazy materialization for wide top-k reads — `SELECT <many columns>
  * FROM t [WHERE p] ORDER BY k LIMIT n` over a parquet relation.
  *
  * The naive plan decodes EVERY projected column of EVERY matching row
  * just to keep n of them. This rule runs a bounded pre-pass over the
  * narrow column set (the sort key + filter references), takes the
  * k-th sort-key value, and injects `key <= bound` (resp. `>=` for
  * DESC) directly above the relation. The bound is an ordinary literal
  * predicate, so the parquet reader's row-group statistics prune the
  * wide phase: on a time-ordered table a `ORDER BY EventTime LIMIT 10`
  * touches the first slice of the table instead of all of it — at
  * 100 TB the difference between one executor-minute and a full-fleet
  * scan. Semantics are exact: every row of the true top-k has a
  * first-key value within the bound (the k-th smallest first-key over
  * the same row set bounds them all, ties included), and the final
  * Sort + Limit is left in place, so the rewrite only removes rows the
  * limit was about to discard.
  *
  * The same idea ships in modern columnar engines as "lazy
  * materialization" (ClickHouse 25.4's query-condition-from-top-k; the
  * reference fork predates it — this is an extension); Spark's
  * execution model has no late-materialized row IDs, so the pushable
  * sort-key bound is the idiomatic route to the same I/O shape.
  *
  * Fires only when it can win and cannot be wrong:
  *  - batch parquet `LogicalRelation` under a Project/Filter-only chain,
  *    deterministic predicates, no subqueries;
  *  - first sort key is a plain attribute of an atomic orderable type
  *    (pushable to parquet statistics);
  *  - at least [[minSavedCols]] columns are read that the narrow
  *    pre-pass does not need (else the pre-pass IS the query);
  *  - `n <= maxK` (the pre-pass collects n scalars to the driver —
  *    bounded by contract, like the ANN training samples).
  */
object LazyTopK {

  /** Minimum columns saved (output width minus narrow set) to fire. */
  @volatile var minSavedCols: Int = 8

  /** Largest LIMIT the pre-pass will collect. */
  @volatile var maxK: Int = 100000

  /** Marks an injected bound so the fixpoint batch cannot re-fire. */
  private val BoundedTag = TreeNodeTag[Boolean]("graft.lazyTopK.bounded")

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(Rewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ Rewrite

  /** Plan test used by the bench's routing-proof flags. */
  def usesLazyTopK(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case f: Filter => f.getTagValue(BoundedTag).contains(true)
      case _ => false
    }

  object Rewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
      case gl @ GlobalLimit(IntegerLiteral(k),
          ll @ LocalLimit(_, s @ Sort(orders, true, child, _)))
          if k > 0 && k <= maxK && orders.nonEmpty =>
        rewrite(k, s, child, orders) match {
          case Some(newChild) =>
            gl.copy(child = ll.copy(child = s.copy(child = newChild)))
          case None => gl
        }
    }

    private def rewrite(k: Int, sort: Sort, child: LogicalPlan,
                        orders: Seq[SortOrder]): Option[LogicalPlan] = {
      // The pre-pass runs a REAL narrow scan during logical optimization,
      // so plan-only inspection (EXPLAIN endpoints) of a matching query
      // would do executor I/O at planning time. Explain paths disable it
      // via this conf (sql/Search.scala does); default on.
      if (conf.getConfString("spark.graft.lazyTopK.prePass", "true") != "true")
        return None
      // first sort key must be a plain, parquet-stat-pushable attribute
      val key = orders.head.child match {
        case a: AttributeReference if pushable(a.dataType) => a
        case _ => return None
      }
      // Project/Filter-only chain over one batch parquet relation, with
      // attribute-only projections (no recomputation in the pre-pass)
      var rel: LogicalRelation = null
      var conds: Seq[Expression] = Nil
      var ok = true
      var bounded = false
      child.foreach {
        case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, false, _)
            if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
          if (rel != null) ok = false else rel = lr
        case p: Project =>
          if (!p.projectList.forall(_.isInstanceOf[AttributeReference]))
            ok = false
        case f: Filter =>
          if (f.getTagValue(BoundedTag).contains(true)) bounded = true
          conds = conds :+ f.condition
        case _ => ok = false
      }
      if (!ok || rel == null || bounded) return None
      if (!rel.output.exists(_.exprId == key.exprId)) return None
      if (conds.exists(c => !c.deterministic ||
          c.exists(_.isInstanceOf[PlanExpression[_]]))) return None

      // width guard: the wide phase must read substantially more than
      // the pre-pass needs
      val narrow = AttributeSet(conds.flatMap(_.references) :+ key)
      if (child.output.size - narrow.size < minSavedCols) return None

      boundOf(k, sort, child, key, orders.head).map { bound =>
        val pred =
          if (key.nullable) Or(bound, IsNull(key))
          else bound
        child.transformUp {
          case lr: LogicalRelation if lr eq rel =>
            val f = Filter(pred, lr)
            f.setTagValue(BoundedTag, true)
            f
        }
      }
    }

    /** Run the narrow pre-pass and turn its k-th first-key value into a
      * pushable bound predicate. None = skip the rewrite (empty input,
      * all-null keys, or any execution failure). */
    private def boundOf(k: Int, sort: Sort, child: LogicalPlan,
                        key: AttributeReference,
                        order: SortOrder): Option[Expression] =
      try {
        val spark = SparkSession.active
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val narrowPlan = GlobalLimit(Literal(k),
          LocalLimit(Literal(k),
            Sort(Seq(SortOrder(key, order.direction, order.nullOrdering,
                Seq.empty)), global = true,
              Project(Seq(key), child), None)))
        val rows = new org.apache.spark.sql.execution.QueryExecution(
          spark, narrowPlan).executedPlan.executeCollect()
        if (rows.isEmpty) return None
        // ties and secondary keys are safe: the k-th smallest (largest
        // for DESC) first-key value over the same rows bounds every
        // member of the true lexicographic top-k
        val vals = rows.toSeq.filterNot(_.isNullAt(0))
          .map(_.get(0, key.dataType))
        if (vals.isEmpty) return None // nulls-first top-k is all-null
        val lit = Literal(vals.last, key.dataType)
        Some(order.direction match {
          case Ascending => LessThanOrEqual(key, lit)
          case Descending => GreaterThanOrEqual(key, lit)
        })
      } catch {
        // never swallow fatals or a cancellation: a cancelled query must
        // not proceed through the planning-time pre-pass as if fine
        case ie: InterruptedException => throw ie
        case scala.util.control.NonFatal(_) => None
      }

    private def pushable(dt: DataType): Boolean = dt match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
           _: FloatType | _: DoubleType | _: StringType | _: DateType |
           _: TimestampType | _: DecimalType | _: BooleanType => true
      case _ => false
    }
  }
}
