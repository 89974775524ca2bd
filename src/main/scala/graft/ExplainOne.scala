package graft

import org.apache.spark.sql.SparkSession

/** Debug aid: print the optimized + physical plan of one registered
  * query. Usage: runMain graft.ExplainOne <name> <sfDir>. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    val df = SparkEntry.queries(name)(spark, sfDir)
    // println goes to stdout (sbt shows as [info]); keep markers greppable
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.toString)
    println("=== PHYSICAL ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
