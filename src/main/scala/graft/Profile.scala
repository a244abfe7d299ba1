package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: run a named query with Bench's session/config and print
  * per-job wall clock + summed task time, so driver-side gaps (planning,
  * codegen, collect latency) separate from executor work.
  * Usage: java ... graft.Profile <queryName> [sfDir] [cpus] */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = BenchKit.session(cpus)
    BenchKit.warmup(spark, sfDir)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val taskMs = new java.util.concurrent.atomic.LongAdder
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (j.time, ""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        Option(jobs.get(j.jobId)).foreach { case (t0, _) =>
          println(f"[job] id=${j.jobId}%3d wall=${(j.time - t0) / 1000.0}%7.3fs")
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          taskMs.add(t.taskMetrics.executorRunTime)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val tm = Option(i.taskMetrics)
        val rt = tm.map(_.executorRunTime).getOrElse(0L)
        val gc = tm.map(_.jvmGCTime).getOrElse(0L)
        val cpu = tm.map(_.executorCpuTime / 1000000).getOrElse(0L)
        if (rt > 200)
          println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%3d " +
            f"run=${rt / 1000.0}%7.3fs cpu=${cpu / 1000.0}%7.3fs gc=${gc / 1000.0}%6.3fs  ${i.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // two passes like Bench: pass 1 warms JIT/codegen, pass 2 is the number
    (1 to 2).foreach { pass =>
      taskMs.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(300)
      println(f"[pass $pass] wall=$wall%.3fs summedTask=${taskMs.sum() / 1000.0}%.3fs")
    }
    spark.stop()
  }
}
