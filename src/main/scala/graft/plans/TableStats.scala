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

  /** column name (lower-cased) → (ndv, rowCountOfItsTable) */
  private val stats = new ConcurrentHashMap[String, (Long, Long)]()

  private def groupable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         DateType | TimestampType | BooleanType => true
    case _ => false
  }

  /** Analyze `df`: one pass computing count + approx NDV for every
    * groupable column (or the explicit `cols` subset). */
  def analyze(df: DataFrame, cols: Seq[String] = Nil): Unit = {
    val names =
      if (cols.nonEmpty) cols
      else df.schema.fields.filter(f => groupable(f.dataType)).map(_.name).toSeq
    if (names.isEmpty) return
    val row = df.agg(count(lit(1)).as("__rows"),
      names.map(c => approx_count_distinct(col(c)).as(c)): _*).head()
    val rows = row.getLong(0)
    names.zipWithIndex.foreach { case (c, i) =>
      stats.put(c.toLowerCase, (row.getLong(i + 1), rows))
    }
  }

  /** (ndv, tableRows) for a column, if analyzed. */
  def ndv(column: String): Option[(Long, Long)] =
    Option(stats.get(column.toLowerCase))

  def clear(): Unit = stats.clear()
}
