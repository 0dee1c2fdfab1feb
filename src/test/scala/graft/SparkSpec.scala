package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per `sbt test` fork). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The local-mode executor shares the driver JVM; under GC pauses or
      // neighbor load its heartbeats to HeartbeatReceiver can fail
      // repeatedly, and Executor.reportHeartBeat calls
      // System.exit(ExecutorExitCode.HEARTBEAT_FAILURE=56) after
      // spark.executor.heartbeat.maxFailures consecutive misses -- killing
      // the whole sbt test fork even when every test passed. Heartbeats
      // carry only liveness/metrics in tests; make the killer unreachable.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .config("spark.executor.heartbeat.maxFailures", s"${Int.MaxValue}")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
