package graft

import org.apache.spark.sql.SparkSession

/** TokenBloom on/off A/B over the 100 M cold hits table (VERDICT r11
  * task 3): times the suite's LIKE scans (q21 `URL LIKE '%metrika%'`,
  * q22 adds a group-by over the same scan) through the plain parquet
  * scan and through `TokenBloomIndex.scanLike`, and records how many
  * files the URL n-gram sidecar pruned.
  *
  * Expected result on THIS table, stated up front: **zero pruning**.
  * The generator spreads `metrika` URLs uniformly (0.8 % of every
  * file), so every per-file bloom contains the pattern's 4-grams —
  * the index can only win on token-clustered layouts
  * (`TokenBloomIndex.scala` scaladoc; the reference's ngram skip index
  * has the same precondition, `MergeTreeIndexFullText.cpp:375`). The
  * point of the A/B is to measure that honestly: same timings within
  * noise, `files_pruned = 0`, and the sidecar consult adding only
  * planning-time milliseconds. The gated q_like_bloom_scan covers the
  * clustered layout where pruning does bite.
  *
  * Appends a `like_bloom_ab` object into target/BENCH_hits100m_cold
  * .json when present (else prints the JSON line alone).
  */
object BenchBloomAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        s"/dev/shm/spark-graft-${ProcessHandle.current().pid()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)
    val path = BenchHits.Path100m
    BenchHits.generate(spark, path, BenchHits.Rows100m)

    val side = graft.plans.TokenBloomIndex.sidecarPath(path)
    val fs = new org.apache.hadoop.fs.Path(side)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buildSec =
      if (fs.exists(new org.apache.hadoop.fs.Path(side + "/_SUCCESS"))) 0.0
      else {
        val t0 = System.nanoTime()
        graft.plans.TokenBloomIndex.build(spark, path, Seq("URL"), n = 4)
        (System.nanoTime() - t0) / 1e9
      }

    def timeNoop(df: org.apache.spark.sql.DataFrame, runs: Int): Double =
      (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    import org.apache.spark.sql.functions._
    val pattern = "%metrika%"
    // q21 / q22 with the scan swapped for the index-pruned one
    def q21(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("URL").like(pattern)).groupBy().count()
    def q22(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("URL").like(pattern) && col("SearchPhrase") =!= "")
        .groupBy(col("SearchPhrase"))
        .agg(any_value(col("URL")), count(lit(1)).as("c"))
        .orderBy(col("c").desc).limit(10)

    val plain = spark.read.parquet(path)
    // warm the page cache symmetrically: one untimed pass each
    timeNoop(q21(plain), 1)
    val offQ21 = timeNoop(q21(plain), 3)
    val offQ22 = timeNoop(q22(plain), 3)

    val tPrune0 = System.nanoTime()
    val (bloomDf, filesRead, filesTotal) =
      graft.plans.TokenBloomIndex.scanLike(spark, path, "URL", pattern)
    val pruneSec = (System.nanoTime() - tPrune0) / 1e9
    val onQ21 = timeNoop(q21(bloomDf), 3) // re-applying LIKE is idempotent
    val onQ22 = timeNoop(q22(bloomDf), 3)

    val line =
      f"""{"like_bloom_ab":{"pattern":"$pattern","files_total":$filesTotal,"files_read":$filesRead,"files_pruned":${filesTotal - filesRead},"sidecar_build_sec":$buildSec%.1f,"prune_plan_sec":$pruneSec%.3f,"q21_off_sec":$offQ21%.3f,"q21_on_sec":$onQ21%.3f,"q22_off_sec":$offQ22%.3f,"q22_on_sec":$onQ22%.3f}}"""
    println(line)
    // merge into the cold snapshot when it exists
    val snap = java.nio.file.Paths.get("target/BENCH_hits100m_cold.json")
    if (java.nio.file.Files.exists(snap)) {
      val cur = java.nio.file.Files.readString(snap).trim
      if (cur.endsWith("}") && !cur.contains("like_bloom_ab")) {
        val merged = cur.dropRight(1) + "," + line.drop(1)
        java.nio.file.Files.writeString(snap, merged)
      }
    }
    spark.stop()
  }
}
