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
  * Columns are keyed by name (last registration wins); a per-exprId
  * catalog would be the production refinement.
  */
object TableStats {

  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  /** (canonicalized relation leaf, lower-cased column) →
    * (ndv, rowCountOfItsTable). Leaf-scoping keeps one table's
    * statistics from driving plans for a different table that happens
    * to share a column name. */
  private val stats = new ConcurrentHashMap[(LogicalPlan, String), (Long, Long)]()

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
    * DataFrame's relation leaf. */
  def analyze(df: DataFrame, cols: Seq[String] = Nil): Unit = {
    val leaf = leafOf(df.queryExecution.optimizedPlan).getOrElse(
      throw new IllegalArgumentException(
        "TableStats.analyze requires a single-relation DataFrame " +
          "(stats are keyed to the scanned relation); analyze each base " +
          "table before joining"))
    val names =
      if (cols.nonEmpty) cols
      else df.schema.fields.filter(f => groupable(f.dataType)).map(_.name).toSeq
    if (names.isEmpty) return
    val row = df.agg(count(lit(1)).as("__rows"),
      names.map(c => approx_count_distinct(col(c)).as(c)): _*).head()
    val rows = row.getLong(0)
    names.zipWithIndex.foreach { case (c, i) =>
      stats.put((leaf, c.toLowerCase), (row.getLong(i + 1), rows))
    }
  }

  /** Copy `cols` statistics from one relation leaf to another — for
    * derived same-rows relations (projections), whose per-column NDV
    * and row count are identical to the base by construction. */
  def inherit(from: LogicalPlan, to: LogicalPlan,
              cols: Iterable[String]): Unit =
    cols.foreach { c =>
      val v = stats.get((from.canonicalized, c.toLowerCase))
      if (v != null) stats.put((to.canonicalized, c.toLowerCase), v)
    }

  /** (ndv, tableRows) for a column of the given relation leaf. */
  def ndv(leaf: LogicalPlan, column: String): Option[(Long, Long)] =
    Option(stats.get((leaf.canonicalized, column.toLowerCase)))

  def clear(): Unit = stats.clear()
}
