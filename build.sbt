ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pywcmpspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Run StreamingSpec in its own forked JVM: stateful streaming queries own
// RPC endpoints whose shutdown can race the shared session's executor
// heartbeater (the round-3 exit-56 flake). Isolation bounds the blast
// radius; the heartbeat conf in TestSpark makes the killer unreachable.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts  = (Test / javaOptions).value.toVector
  val fo    = ForkOptions().withRunJVMOptions(opts)
  val (streaming, core) = tests.partition(_.name.contains("StreamingSpec"))
  Seq(
    Tests.Group("core", core, Tests.SubProcess(fo)),
    Tests.Group("streaming", streaming, Tests.SubProcess(fo)),
  ).filter(_.tests.nonEmpty)
}
// one forked test JVM at a time (each takes a large heap)
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
javaOptions ++= jdk17AddOpens ++ Seq(
  // throughput GC: the validator is allocation-heavy (interpreted
  // higher-order functions); G1's concurrent cycles throttle 32-thread
  // scaling on a single shared heap
  "-XX:+UseParallelGC",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",  // 32 local threads are GC-bound below ~32g,
  // -Xms = -Xmx: with a growing heap, ParallelGC young collections that
  // coincide with heap expansion were measured at up to 9.8 s STW on
  // this box (2.5G->5.1G growth mid-bench; the round-5 artifact's wild
  // per-query outliers — 36 s q_simhash_pairs samples — are exactly
  // these pauses landing inside a timed query). A fixed-size heap makes
  // the same collection 20-600 ms. Standard practice for any fixed-size
  // deployment (spark-submit sets executor Xms=Xmx the same way).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // raise the Metaspace high-water mark: every Spark query JIT-compiles
  // fresh Janino codegen classes, and the default ~21 MB threshold fires
  // a FULL GC ("Metadata GC Threshold") every few queries — measured 4
  // full pauses inside the first minute of a bench run. 512 MB absorbs
  // the whole suite's generated classes without metadata-triggered GCs.
  "-XX:MetaspaceSize=512m",
)
