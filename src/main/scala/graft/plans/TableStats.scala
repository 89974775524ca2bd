package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column NDV statistics registry — the engine-decision input the
  * reference gets from its runtime hash-table growth (its Aggregator
  * converts to two-level when the map passes a size threshold,
  * `src/Interpreters/Aggregator.cpp`). A static planner can't watch the
  * hash table grow, so graft takes the classic ANALYZE route instead:
  * one aggregation pass per registered table computes row count +
  * approx NDV per groupable column, and [[SkipPartialAgg]] consults the
  * registry at plan time.
  *
  * The pass is one distributed job over HLL sketches (no collect of
  * data, bounded state per column), so at 100 TB it costs one scan at
  * registration — the same place a warehouse runs ANALYZE TABLE.
  *
  * Statistics are keyed by (canonicalized relation leaf, attribute
  * exprId): the leaf scopes one table's statistics away from another
  * table that shares a column name, and the exprId pins each statistic
  * to the exact attribute that was analyzed — a column RENAMED to an
  * analyzed name (`SELECT low_card AS user_id`) resolves to a different
  * exprId, misses, and safely vetoes instead of borrowing the wrong
  * NDV. Re-analyzing a relation evicts all of its previous entries
  * first, so a schema or lineage change can't leave stale columns
  * behind.
  */
object TableStats {

  import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  /** (canonicalized relation leaf, attribute exprId) →
    * (ndv, rowCountOfItsTable). */
  private val stats = new ConcurrentHashMap[(LogicalPlan, ExprId), (Long, Long)]()

  private def groupable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         DateType | TimestampType | BooleanType => true
    case _ => false
  }

  /** The single relation leaf a plan scans, if it has exactly one. */
  def leafOf(plan: LogicalPlan): Option[LogicalPlan] =
    plan.collectLeaves() match {
      case Seq(one) => Some(one.canonicalized)
      case _ => None
    }

  /** Analyze `df`: one pass computing count + approx NDV for every
    * groupable column (or the explicit `cols` subset), keyed to the
    * DataFrame's relation leaf + each column's attribute identity.
    * Prior statistics for the same relation are evicted first. */
  def analyze(df: DataFrame, cols: Seq[String] = Nil): Unit = {
    val leaf = leafOf(df.queryExecution.optimizedPlan).getOrElse(
      throw new IllegalArgumentException(
        "TableStats.analyze requires a single-relation DataFrame " +
          "(stats are keyed to the scanned relation); analyze each base " +
          "table before joining"))
    val out = df.queryExecution.analyzed.output
    val names =
      if (cols.nonEmpty) cols
      else df.schema.fields.filter(f => groupable(f.dataType)).map(_.name).toSeq
    if (names.isEmpty) return
    val ids = names.map { c =>
      out.find(_.name.equalsIgnoreCase(c)).getOrElse(throw
        new IllegalArgumentException(s"TableStats.analyze: no column $c")).exprId
    }
    val row = df.agg(count(lit(1)).as("__rows"),
      names.map(c => approx_count_distinct(col(c)).as(c)): _*).head()
    val rows = row.getLong(0)
    // evict-then-insert: re-registration must not leave stale attributes
    stats.keySet.removeIf(_._1 == leaf)
    ids.zipWithIndex.foreach { case (id, i) =>
      stats.put((leaf, id), (row.getLong(i + 1), rows))
    }
  }

  /** Copy statistics from one relation leaf to another for the given
    * attributes — for derived same-rows relations (projections), whose
    * per-column NDV and row count are identical to the base by
    * construction. The attributes keep their exprIds across the
    * derivation (same lineage), so the copy is keyed by identity. */
  def inherit(from: LogicalPlan, to: LogicalPlan,
              attrs: Iterable[Attribute]): Unit =
    attrs.foreach { a =>
      val v = stats.get((from.canonicalized, a.exprId))
      if (v != null) stats.put((to.canonicalized, a.exprId), v)
    }

  /** (ndv, tableRows) for an attribute of the given relation leaf. */
  def ndv(leaf: LogicalPlan, id: ExprId): Option[(Long, Long)] =
    Option(stats.get((leaf.canonicalized, id)))

  def clear(): Unit = stats.clear()
}
