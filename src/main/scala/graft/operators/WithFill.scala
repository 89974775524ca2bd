package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ORDER BY … WITH FILL — gap-filling over an ordered integer axis
  * (reference: daisy `src/Processors/QueryPlan/FillingStep.cpp`,
  * `src/Processors/Transforms/FillingTransform.cpp`: inserts synthetic
  * rows for missing ORDER BY values at STEP intervals; other columns take
  * defaults).
  *
  * Composition: the observed min/max (or explicit FROM/TO) define a dense
  * `sequence()` series, exploded and left-joined against the real rows;
  * missing measure columns are coalesced to their fill value.
  *
  * Scale: the series explode produces (to-from)/step rows from a 1-row
  * frame — repartitioned before the join so the join parallelizes; the
  * join itself is broadcast when the series is small (usual case: time
  * buckets), else shuffled on the axis.
  */
object WithFill {

  /** Fill gaps in `df` on integer axis column `axis` at `step` intervals
    * between the observed min and max (inclusive). Columns in `fillZero`
    * are coalesced to 0; all other non-axis columns left NULL on filled
    * rows. */
  def fillGaps(df: DataFrame, axis: String, step: Long,
               fillZero: Seq[String]): DataFrame = {
    val bounds = df.agg(min(col(axis)).as("mn"), max(col(axis)).as("mx"))
    val series = bounds
      .select(explode(sequence(col("mn"), col("mx"), lit(step))).as(axis))
      .repartition(col(axis))
    val joined = series.join(df, Seq(axis), "left")
    val outCols = joined.columns.map { c =>
      if (fillZero.contains(c)) coalesce(col(c), lit(0L)).as(c) else col(c)
    }
    joined.select(outCols.toSeq: _*)
  }
}
