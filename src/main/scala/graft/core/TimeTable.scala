package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-first-class table layout — the reference's core data model
  * (daisy: `_time DateTime64(3)` auto-column, default PARTITION BY /
  * ORDER BY are granularity functions of `_time` —
  * `src/Server/RestRouterHandlers/TabularTableRestRouterHandler.cpp:15-31`,
  * `src/Interpreters/AddTimeParamVisitor.cpp`).
  *
  * Spark mapping: parquet tables partitioned by a derived time-bucket
  * directory column; reads with time bounds emit BOTH the `_time` range
  * filter and the derived bucket filter so Hive-style partition pruning
  * eliminates whole directories before any file is opened. Rows are
  * sorted within partitions on the ORDER BY key (parquet row-group
  * min/max stats then prune within files — the analogue of the
  * reference's primary-key index).
  *
  * At 100 TB this is the difference between touching ~hours of data and
  * touching everything: pruning is directory-listing-time, not scan-time.
  */
object TimeTable {

  /** Supported partition granularities (daisy partition_by_granularity:
    * M/D/H — TabularTableRestRouterHandler.cpp). */
  sealed trait Granularity { def truncUnit: String }
  case object Hourly extends Granularity { val truncUnit = "hour" }
  case object Daily extends Granularity { val truncUnit = "day" }
  case object Monthly extends Granularity { val truncUnit = "month" }

  val BucketCol = "_time_bucket"

  /** Write `df` as a time-partitioned table. `timeCol` defaults missing
    * values to now (the `_time DEFAULT now64(3)` behavior); rows are
    * sorted within partitions by `orderBy` for row-group skipping. */
  def write(df: DataFrame, path: String, timeCol: String = "_time",
            granularity: Granularity = Daily,
            orderBy: Seq[String] = Seq.empty): Unit = {
    val withTime = df.withColumn(timeCol,
      coalesce(col(timeCol), current_timestamp()))
    val bucketed = withTime.withColumn(BucketCol,
      date_format(date_trunc(granularity.truncUnit, col(timeCol)),
        "yyyy-MM-dd-HH"))
    val sorted =
      if (orderBy.nonEmpty)
        bucketed.repartition(col(BucketCol))
          .sortWithinPartitions(orderBy.map(col): _*)
      else bucketed
    sorted.write.mode("overwrite").partitionBy(BucketCol).parquet(path)
  }

  /** Read with time bounds: the REST layer's start_time/end_time →
    * `_time >= start AND _time < end` injection (AddTimeParamVisitor),
    * plus the derived partition-bucket predicate for pruning. */
  def readBounded(spark: SparkSession, path: String,
                  startIso: String, endIso: String,
                  timeCol: String = "_time",
                  granularity: Granularity = Daily): DataFrame = {
    val start = lit(startIso).cast("timestamp")
    val end = lit(endIso).cast("timestamp")
    val bucketLo = date_format(date_trunc(granularity.truncUnit, start), "yyyy-MM-dd-HH")
    val bucketHi = date_format(date_trunc(granularity.truncUnit, end), "yyyy-MM-dd-HH")
    spark.read.parquet(path)
      .filter(col(BucketCol) >= bucketLo && col(BucketCol) <= bucketHi)
      .filter(col(timeCol) >= start && col(timeCol) < end)
  }
}
