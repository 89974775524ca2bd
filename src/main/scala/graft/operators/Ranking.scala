package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed fractional (average) ranking — the building block for
  * rank-based statistics (mannWhitneyUTest, rankCorr — daisy
  * `src/AggregateFunctions/AggregateFunctionMannWhitney.h`).
  *
  * A naive `row_number() OVER (ORDER BY x)` funnels every row through one
  * task. Here the global order comes from `RDD.sortBy` (range-partitioned
  * distributed sort) and `zipWithIndex` (per-partition offsets computed
  * with one lightweight count job) — every stage is parallel, so the same
  * plan ranks 10^11 rows across a cluster. Ties share the average of
  * their positions (fractional ranking), matching the statistical
  * definition used by the U test.
  */
object Ranking {

  /** Average rank per distinct value of numeric column `valueCol`:
    * returns (valueCol, avg_rank). Join back on `valueCol` to attach
    * ranks to rows. */
  def avgRanks(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = df.select(col(valueCol).cast("double")).rdd
      .map(_.getDouble(0))
      .sortBy(identity)
      .zipWithIndex()
      .map { case (x, i) => (x, i + 1L) }
      .toDF(valueCol, "pos")
    ranked.groupBy(col(valueCol))
      .agg(avg(col("pos")).as("avg_rank"))
  }
}
