package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** scratch: per-stage attribution for one query (not driver contract) —
  * prints every completed stage's executor run time, task count and the
  * first line of its call-site/description, to find which stage of a
  * multi-job operator burns the CPU. */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = sys.env.getOrElse("SPARK_GRAFT_QUERY", "q_simhash_pairs")
    val spark = Bench.session(cpus)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.submissionTime; b <- si.completionTime)
          yield (b - a) / 1000.0).getOrElse(-1.0)
        System.err.println(
          f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=$wall%6.2fs " +
          f"run=${m.executorRunTime / 1000.0}%8.2fs " +
          f"cpu=${m.executorCpuTime / 1e9}%8.2fs " +
          f"deser=${m.executorDeserializeTime / 1000.0}%6.2fs " +
          f"gc=${m.jvmGCTime / 1000.0}%6.2fs " +
          si.name.takeWhile(_ != '\n').take(60))
      }
    })
    // dumps outside the timing, like Bench
    try {
      SparkEntry.imageMediaTable(spark, sfDir).count()
      SparkEntry.simhashSigTable(spark, sfDir).count()
      SparkEntry.minhashBandTable(spark, sfDir).count()
      SparkEntry.embSigTable(spark, sfDir).count()
      SparkEntry.adpcmRefTable(spark, sfDir).count()
    } catch { case _: Throwable => }
    System.err.println(s"[stageprof] ---- $name begins ----")
    val (_, sec) = Bench.time(
      SparkEntry.queries(name)(spark, sfDir).count())
    System.err.println(f"[stageprof] $name total $sec%.2fs")
    spark.stop()
  }
}
