package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.RecordTable
import graft.streaming.StreamingValidator

/** Streaming face: the batch catalog under readStream, windowed verdicts
  * behind a watermark, stateful failure streaks. Driven synchronously via
  * the memory sink + processAllAvailable. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  def writeInput(dir: String, n: Long, tsBase: String): Unit =
    RecordTable.synthesize(spark, n)
      .withColumn("event_time",
        timestamp_seconds(unix_timestamp(to_timestamp(lit(tsBase))) +
          pmod(xxhash64(col("path")), lit(60))))
      .write.mode("append").parquet(dir)

  test("streaming validation: same verdicts as batch, incrementally") {
    val dir = Files.createTempDirectory("stream-in").toString
    writeInput(dir, 200, "2026-08-16 10:00:00")

    val validated = StreamingValidator.readRecordStream(spark, dir,
      maxFilesPerTrigger = 2)
    val q = StreamingValidator.violationStream(validated)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("violations_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("violations_stream").count()
      val batch = RecordTable.expectedFailing(200)
      assert(streamed == batch)
      // late-arriving second batch is still processed
      writeInput(dir, 100, "2026-08-16 10:02:00")
      q.processAllAvailable()
      assert(spark.table("violations_stream").count() ==
        batch + RecordTable.expectedFailing(100))
    } finally q.stop()
  }

  test("windowed verdicts: per-window per-lang counts under watermark") {
    val dir = Files.createTempDirectory("stream-in2").toString
    writeInput(dir, 200, "2026-08-16 10:00:00")
    val q = StreamingValidator.windowedVerdicts(
        StreamingValidator.readRecordStream(spark, dir), "1 minute")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("verdicts_stream").start()
    try {
      q.processAllAvailable()
      // append-mode windowed aggs only emit when the watermark passes the
      // window end; push it forward with a late batch
      writeInput(dir, 20, "2026-08-16 10:30:00")
      q.processAllAvailable()
      val rows = spark.table("verdicts_stream")
        .select("lang", "records", "failed_records", "verdict").collect()
      assert(rows.nonEmpty)
      val total = rows.map(_.getLong(1)).sum
      assert(total == 200)
      assert(rows.forall(r => r.getString(3) == "FAIL" ||
        r.getLong(2) == 0))
    } finally q.stop()
  }

  test("stateful failure streaks fire exactly at the threshold") {
    val dir = Files.createTempDirectory("stream-in3").toString
    // repo r14: bucket 14 (i%20==14 -> i%1000==14 since n small) fails
    // every time; with n=200, repo rX gets i and i+... single rows. Use a
    // crafted input instead: one repo failing 4x, one alternating.
    val bad = RecordTable.fixtures(spark)
      .where(col("path").endsWith("wcmp2-failing.json"))
      .select("content").as[String].head()
    val good = RecordTable.fixtures(spark)
      .where(col("path").endsWith("wcmp2-passing.json"))
      .select("content").as[String].head()
    val rows = Seq(
      ("always-bad", bad), ("always-bad", bad), ("always-bad", bad),
      ("always-bad", bad),
      ("flaky", bad), ("flaky", good), ("flaky", bad), ("flaky", bad))
      .zipWithIndex.map { case ((repo, c), i) =>
        (repo, s"p$i.json", s"c$i", "en", c,
          java.sql.Timestamp.valueOf("2026-08-16 10:00:00"))
      }
    rows.toDF("repo", "path", "commit", "lang", "content", "event_time")
      .write.mode("overwrite").parquet(dir)
    val q = StreamingValidator.failureStreaks(
        StreamingValidator.readRecordStream(spark, dir), alertAt = 3)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("streaks").start()
    try {
      q.processAllAvailable()
      val alerts = spark.table("streaks").collect()
        .map(r => (r.getString(0), r.getInt(1)))
      // always-bad reaches streak 3 exactly once (4th failure is streak 4,
      // not re-alerted); flaky resets on the pass and never reaches 3
      assert(alerts.toSeq == Seq(("always-bad", 3)))
    } finally q.stop()
  }
}
