package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-evidence dumper: write `.explain("formatted")` of registered
  * queries to <outDir>/<name>.txt (the optimization rounds commit these
  * under plans/rNN/). Usage:
  *   runMain graft.ExplainFmt <sfDir> <outDir> <name>[,<name>...]
  */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    new java.io.File(outDir).mkdirs()
    names.split(",").foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
        println(s"[explainfmt] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[explainfmt] $name failed: ${e.getMessage}")
      } finally Tables.releaseScratch()
    }
    spark.stop()
  }
}
