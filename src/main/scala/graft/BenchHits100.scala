package graft

import org.apache.spark.sql.SparkSession

/** 100 M-row hits suite — the scale BASELINE.md commits to comparing at
  * (reference suite-sum 34.54 s on 2×E5-2650v2 / 128 GiB). Run via
  * tools/run_bench100.sh (100 g heap — see BenchHits.suite scaladoc for
  * the memory budget). Prints one JSON line and writes
  * target/BENCH_hits100m.json; commit the line into BENCH_100M.json for
  * the round artifact (Bench embeds it as a labeled snapshot).
  */
object BenchHits100 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    val ambient = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val cold = sys.env.get("SPARK_GRAFT_HITS_COLD").contains("1")
    val r = BenchHits.suite(spark, BenchHits.Path100m, BenchHits.Rows100m,
      BenchHits.referenceBest100m, passRuns = (3, 2))
    val loadEnd = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val regime = if (cold) "cold" else "cached"
    val line =
      s"""{"metric":"hits100m_suite","value":${r.total},"unit":"sec","rows":100000000,"regime":"$regime","heap":"${Runtime.getRuntime.maxMemory() / (1L << 30)}g","load_avg_ambient":$ambient,"load_avg":$loadEnd,"hits100m_suite_sec":${r.total},"hits100m_slowest_sec":${r.slowest},"hits100m_queries":${r.json}}"""
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        if (cold) "target/BENCH_hits100m_cold.json"
        else "target/BENCH_hits100m.json"), line)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
