package graft

import org.apache.spark.sql.SparkSession

/** Debug aid: dump ONE registered query's result (parquet) for manual
  * DuckDB comparison. Usage: runMain graft.DumpOne <name> <sfDir> <out>. */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, out) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
