package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.{Bench, SparkEntry}
import graft.engine.{DatasetRules, Validator}
import graft.sources.RecordTable

/** Skew-resilience measurement (BASELINE.md evidence; the CI-shaped
  * assertions live in SkewSpec): runs the dataset-level aggregates over a
  * 90%-one-lang corpus and reports per-task duration spread + shuffled
  * record volume. A balanced run shows (a) max/median task time near 1
  * on the compute stage and (b) shuffle record totals bounded by
  * keys x mapTasks — the mechanical reason the hot lang cannot swamp a
  * reducer at 100 TB.
  *
  * Usage: `sbt "runMain graft.tools.SkewBench"` (env SPARK_GRAFT_ROWS,
  * SPARK_GRAFT_CPUS).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "400000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)

    val corpus = RecordTable.synthesize(spark, rows)
      .withColumn("lang",
        when(pmod(xxhash64(col("path")), lit(10)) < 9, "en")
          .otherwise("zh"))

    case class Task(durMs: Long, shuffleRead: Long)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Task]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null)
          buf.add(Task(e.taskInfo.duration, m.shuffleReadMetrics.recordsRead))
      }
    }

    def measure(name: String)(action: => Unit): String = {
      buf.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try {
        action
        var last = -1L; var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val s = buf.size.toLong
          if (s == last) stable += 1 else { stable = 0; last = s }
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      val wall = (System.nanoTime() - t0) / 1e9
      val ts = buf.asScala.toVector
      val durs = ts.map(_.durMs).sorted
      val med = if (durs.isEmpty) 0L else durs(durs.length / 2)
      val max = if (durs.isEmpty) 0L else durs.last
      val spread = if (med > 0) max.toDouble / med else 0.0
      s""""$name":{"wall_sec":${Bench.dec1(wall)},"tasks":${ts.length},""" +
        s""""task_ms_median":$med,"task_ms_max":$max,""" +
        s""""task_spread":${Bench.dec1(spread)},""" +
        s""""shuffle_records":${ts.map(_.shuffleRead).sum}}"""
    }

    // warm codegen + JIT on the full catalog before measuring
    Validator.partitionVerdicts(Validator.validate(corpus)).collect()

    val parts = Seq(
      measure("partition_verdicts") {
        Validator.partitionVerdicts(Validator.validate(corpus)).collect()
      },
      measure("lang_drift") {
        DatasetRules.langDrift(corpus).collect()
      },
      measure("uniqueness") {
        DatasetRules.uniquenessViolations(corpus).count()
      })

    println(s"""{"metric":"skew_resilience","rows":$rows,"cpus":$cpus,""" +
      s""""hot_lang_share":0.9,${parts.mkString(",")}}""")
    spark.stop()
  }
}
