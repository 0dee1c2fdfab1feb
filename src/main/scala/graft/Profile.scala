package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.engine.Validator
import graft.sources.RecordTable
import graft.catalog.{EtsRules, KpiRules, RecordCols}
import graft.model.Wcmp2Schema

/** scratch profiling main (not part of the driver contract) */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ROWS", "20000").toLong
    def records = RecordTable.synthesize(spark, n)

    // 1. raw generation + count
    val (_, g) = Bench.time(records.count())
    println(f"[profile] generate-only: $g%.1fs (${n / g}%.0f rows/s)")
    // 1b. generation steady state at 10x rows + forced content length
    val (_, g2) = Bench.time(RecordTable.synthesize(spark, n * 10)
      .agg(sum(length(col("content")))).collect())
    println(f"[profile] generate-10x-forced: $g2%.1fs (${n * 10 / g2}%.0f rows/s)")
    // 1c. validator over PARQUET-backed records (production shape)
    val pq = java.nio.file.Files.createTempDirectory("records").toString
    RecordTable.synthesize(spark, n).write.mode("overwrite").parquet(pq)
    val fromDisk = spark.read.parquet(pq)
    (1 to 3).foreach { i =>
      val (_, s) = Bench.time(
        Validator.partitionVerdicts(Validator.validate(fromDisk)).collect())
      println(f"[profile] parquet-verdicts#$i: $s%.1fs (${n / s}%.0f rows/s)")
    }

    // 2. parse only
    val parsed = records.withColumn("rec",
      from_json(col("content"), Wcmp2Schema.root))
    val (_, p) = Bench.time(
      parsed.select(col("rec").getField("id").as("rid"))
        .agg(count(col("rid"))).collect())
    println(f"[profile] parse+id: $p%.1fs (${n / p}%.0f rows/s)")

    // 3. full ETS array only
    val geomJson = get_json_object(col("content"), "$.geometry")
    val ets = parsed.withColumn("geometry", geomJson)
      .withColumn("geo_positions",
        graft.functions.GeoFunctions.positions(geomJson))
      .withColumn("props_keys",
        json_object_keys(get_json_object(col("content"), "$.properties")))
      .withColumn("ets", array(EtsRules.catalog(
        RecordCols(col("content"), col("rec"), col("geometry"),
          col("geo_positions"), col("props_keys"))).map(_.result): _*))
    val (_, e) = Bench.time(ets.select(crc32(to_json(col("ets"))))
      .agg(count(lit(1))).collect())
    println(f"[profile] ets-only: $e%.1fs (${n / e}%.0f rows/s)")

    // 4. full KPI array only
    val kpi = parsed.withColumn("geometry", geomJson)
      .withColumn("geo_positions",
        graft.functions.GeoFunctions.positions(geomJson))
      .withColumn("props_keys",
        json_object_keys(get_json_object(col("content"), "$.properties")))
      .withColumn("kpi", array(KpiRules.catalog(
        RecordCols(col("content"), col("rec"), col("geometry"),
          col("geo_positions"), col("props_keys"))).map(_.result): _*))
    val (_, k) = Bench.time(kpi.select(crc32(to_json(col("kpi"))))
      .agg(count(lit(1))).collect())
    println(f"[profile] kpi-only: $k%.1fs (${n / k}%.0f rows/s)")

    // 5. full validator
    val (_, v) = Bench.time(Bench.forceAll(Validator.validate(records)))
    println(f"[profile] full-validate: $v%.1fs (${n / v}%.0f rows/s)")

    // 5b. granular: which stage of the validator is slow?
    val validated = Validator.validate(records)
    def force(name: String, cols: Seq[String]): Unit = {
      val (_, s) = Bench.time(
        validated.select(crc32(to_json(struct(cols.map(col): _*))).as("fp"))
          .agg(sum("fp")).collect())
      println(f"[profile] force:$name%-22s $s%.1fs (${n / s}%.0f rows/s)")
    }
    // repeat to separate JIT warmup from steady state
    (1 to 2).foreach { i =>
      force(s"everything-tojson#$i", Seq("ets_tests", "ets_summary",
        "kpi_tests", "kpi_summary", "validation", "sha256"))
    }
    // the REAL engine pipeline: verdict aggregation + violation extraction
    (1 to 3).foreach { i =>
      val (_, s1) = Bench.time {
        Validator.partitionVerdicts(validated).collect()
      }
      println(f"[profile] verdicts#$i: $s1%.1fs (${n / s1}%.0f rows/s)")
    }
    (1 to 2).foreach { i =>
      val (_, s2) = Bench.time(Validator.violations(validated).count())
      println(f"[profile] violations#$i: $s2%.1fs (${n / s2}%.0f rows/s)")
    }
    // summary-only forcing (no giant to_json serialization)
    (1 to 2).foreach { i =>
      val (_, s3) = Bench.time {
        validated.agg(sum(col("ets_summary.FAILED")),
          sum(col("kpi_summary.score")), sum(crc32(col("sha256")))).collect()
      }
      println(f"[profile] summaries-agg#$i: $s3%.1fs (${n / s3}%.0f rows/s)")
    }

    // 6. plan inspection: parse-expression copies across the WHOLE tree —
    // the engine invariant is EXACTLY ONE JsonFacts kernel (and zero
    // JsonToStructs) per plan; the Generate barrier keeps CollapseProject
    // from re-inlining it per downstream reference
    def countJson(df: DataFrame, name: String): Unit = {
      val plan = df.queryExecution.optimizedPlan
      var n = 0
      var facts = 0
      plan.foreach { node =>
        node.expressions.foreach { e =>
          n += e.collect {
            case j: org.apache.spark.sql.catalyst.expressions.JsonToStructs => j
          }.size
          facts += e.collect {
            case f: graft.expressions.JsonFacts => f
          }.size
        }
      }
      println(s"[profile] $name: JsonToStructs total=$n; JsonFacts=$facts; " +
        s"projects=${plan.collect { case p: org.apache.spark.sql.catalyst.plans.logical.Project => p }.size}")
    }
    countJson(ets.select(crc32(to_json(col("ets")))), "microbench-ets")
    countJson(Validator.validate(records)
      .select("ets_tests", "ets_summary", "kpi_tests", "kpi_summary",
        "validation", "sha256"), "validator-all")
    countJson(Validator.validate(records).select("ets_tests"),
      "validator-ets-only")
    spark.stop()
  }
}
