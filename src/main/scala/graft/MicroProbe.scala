package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profiler for individual SparkEntry (micro-suite) queries —
  * the BenchProbe pattern generalized, so optimization effort lands on
  * the real bottleneck (jobs × scheduling vs shuffle vs compute).
  * Usage: runMain graft.MicroProbe <name> [sfDir] [runs]
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(f"stage=${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"execMs=${m.executorRunTime}%6d cpuMs=${m.executorCpuTime / 1000000}%6d " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1024}%6dKB " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1024}%6dKB " +
          f"gcMs=${m.jvmGCTime}%5d " +
          f"${si.name.takeWhile(_ != '\n').take(70)}")
      }
    })

    // Drain the async listener bus before clearing, so a stage-completed
    // event from run r cannot land after the clear and be attributed to
    // run r+1 (advisor r16). listenerBus is private[spark] — reflection,
    // with a sleep fallback.
    def drainListeners(): Unit =
      try {
        val bus = spark.sparkContext.getClass
          .getMethod("listenerBus").invoke(spark.sparkContext)
        bus.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
          .fold(Thread.sleep(200))(_.invoke(bus): Unit)
      } catch { case _: Throwable => Thread.sleep(200) }

    val fn = SparkEntry.queries(name)
    for (r <- 1 to runs) {
      drainListeners()
      stages.clear()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      finally Tables.releaseScratch()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"--- $name run $r: $dt%.3f s (stages=${stages.size})")
      stages.forEach(s => println("    " + s))
    }
    spark.stop()
  }
}
