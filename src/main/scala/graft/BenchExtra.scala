package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

/** Round-6 optimization harness (NOT driver contract — Bench.scala is the
  * frozen measured artifact; this main exists so guide §1 measurement
  * [noop-sink isolation, plan capture, per-stage attribution] can run
  * without touching the frozen harness).
  *
  * Modes (env SPARK_GRAFT_EXTRA_MODE):
  *  - "plans": write `.explain("formatted")` for every declared query to
  *    plans/r06/<query>_<tag>.txt (tag from SPARK_GRAFT_PLAN_TAG).
  *  - "time" (default): per query, run the SAME count() action Bench uses,
  *    twice (cold + warm), plus a noop-sink run, and report per-query
  *    stage-time totals from a listener.
  * SPARK_GRAFT_ONLY=q1,q2 restricts to a subset.
  */
object BenchExtra {

  private class StageClock extends SparkListener {
    val lock = new Object
    var stageMs = 0L
    var stages = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      lock.synchronized {
        stageMs += sc.stageInfo.taskMetrics.executorRunTime
        stages += 1
      }
    def snap(): (Long, Int) = lock.synchronized { (stageMs, stages) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXTRA_MODE", "time")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val spark = Bench.session(cpus)
    val clock = new StageClock
    spark.sparkContext.addSparkListener(clock)

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }

    // one-off dumps outside the timings, mirroring Bench
    try {
      SparkEntry.imageMediaTable(spark, sfDir).count()
      SparkEntry.simhashSigTable(spark, sfDir).count()
      SparkEntry.minhashBandTable(spark, sfDir).count()
      SparkEntry.embSigTable(spark, sfDir).count()
      SparkEntry.adpcmRefTable(spark, sfDir).count()
    } catch { case _: Throwable => }

    if (mode == "plans") {
      val dir = java.nio.file.Paths.get("plans/r06")
      java.nio.file.Files.createDirectories(dir)
      qs.foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(dir.resolve(s"${name}_$tag.txt"),
            txt.getBytes("UTF-8"))
          System.err.println(s"[plans] $name ok")
        } catch { case e: Throwable =>
          System.err.println(s"[plans] $name FAILED: $e")
        }
      }
    } else {
      def run(name: String, what: String, f: DataFrame => Unit,
              df: => DataFrame): Unit = {
        spark.sparkContext.setJobDescription(s"$name:$what")
        val (ms0, st0) = clock.snap()
        val (_, sec) = Bench.time { try f(df) catch { case _: Throwable => } }
        val (ms1, st1) = clock.snap()
        System.err.println(f"[extra] $name%-28s $what%-6s $sec%7.2fs " +
          f"stages=${st1 - st0}%3d stageCpu=${(ms1 - ms0) / 1000.0}%7.2fs")
      }
      qs.foreach { case (name, fn) =>
        run(name, "cold", _.count(), fn(spark, sfDir))
        run(name, "warm", _.count(), fn(spark, sfDir))
        run(name, "noop",
          _.write.format("noop").mode("overwrite").save(), fn(spark, sfDir))
      }
    }
    spark.stop()
  }
}
