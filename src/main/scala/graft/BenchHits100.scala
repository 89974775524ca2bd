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
      // per-process subdir: a second bench JVM sharing the bare parent
      // registers it for delete-on-exit when it created it, wiping this
      // app's live shuffle files mid-run (observed: 1 B suite killed at
      // q16 by a concurrent sf0.1 bench exiting)
      .config("spark.local.dir",
        s"/dev/shm/spark-graft-${ProcessHandle.current().pid()}")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    val ambient = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // SPARK_GRAFT_HITS_ROWS=1000000000 switches to the 1 B scale point
    // (forced cold inside suite(); single-run passes — each full pass
    // scans ~60 GB of parquet 43 times).
    val rows = sys.env.get("SPARK_GRAFT_HITS_ROWS").map(_.toLong)
      .getOrElse(BenchHits.Rows100m)
    val (path, refBest, passes, label) =
      if (rows >= BenchHits.Rows1b)
        (BenchHits.Path1b, BenchHits.referenceBest1b, (1, 1), "hits1b")
      else (BenchHits.Path100m, BenchHits.referenceBest100m, (3, 2), "hits100m")
    val r = BenchHits.suite(spark, path, rows, refBest, passRuns = passes)
    val loadEnd = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // label from the regime suite() actually ran, never a re-derived copy
    // of its policy — the two must not be able to diverge
    val cold = r.cold
    val regime = if (cold) "cold" else "cached"
    val line =
      s"""{"metric":"${label}_suite","value":${r.total},"unit":"sec","rows":$rows,"regime":"$regime","heap":"${Runtime.getRuntime.maxMemory() / (1L << 30)}g","load_avg_ambient":$ambient,"load_avg":$loadEnd,"${label}_suite_sec":${r.total},"${label}_slowest_sec":${r.slowest},"${label}_queries":${r.json}}"""
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        if (rows >= BenchHits.Rows1b) "target/BENCH_hits1b.json"
        else if (cold) "target/BENCH_hits100m_cold.json"
        else "target/BENCH_hits100m.json"), line)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
