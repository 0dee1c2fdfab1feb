package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Report emission (S7): one JSON document per record per suite, matching
  * the reference's report shapes (`/root/reference/pywcmp/resources/
  * ets-report.json:1-83`, `kpi-report.json:1-106`).
  *
  * Nondeterminism injection (SURVEY.md §7.4-9): the reference stamps
  * `uuid4()` + wall-clock datetime (`ets.py:81,111`, `kpi.py:522-525`);
  * here the report id is a deterministic function of the record identity
  * (reproducible reruns, testable goldens) and the datetime is an
  * injectable run timestamp — pass the driver's clock once per job.
  */
object Reports {

  val GeneratedBy =
    "graft-wcmp2spark 0.1.0 (Spark-native WCMP2 validation engine)"

  private def reportId(suite: String): Column =
    // deterministic uuid-shaped id from the record identity + suite
    concat(
      substring(col("sha256"), 1, 8), lit("-"),
      substring(col("sha256"), 9, 4), lit("-"),
      substring(sha2(concat(col("repo"), col("path"), col("commit"),
        lit(suite)), 256), 1, 4), lit("-"),
      substring(col("sha256"), 13, 4), lit("-"),
      substring(col("sha256"), 17, 12))

  /** ETS report JSON column per validated record (`ets.py:78-114`). */
  def etsReportJson(runDatetime: String): Column =
    to_json(struct(
      reportId("ets").as("id"),
      lit("ets").as("report_type"),
      col("ets_summary").as("summary"),
      col("ets_tests").as("tests"),
      lit(runDatetime).as("datetime"),
      get_json_object(col("content"), "$.id").as("metadata_id"),
      lit(GeneratedBy).as("generated_by")), Map("ignoreNullFields" -> "true"))

  /** KPI report JSON column per validated record (`kpi.py:521-557`). */
  def kpiReportJson(runDatetime: String): Column =
    to_json(struct(
      reportId("kpi").as("id"),
      lit("kpi").as("report_type"),
      get_json_object(col("content"), "$.id").as("metadata_id"),
      lit(runDatetime).as("datetime"),
      lit(GeneratedBy).as("generated_by"),
      col("kpi_tests").as("tests"),
      col("kpi_summary").as("summary")), Map("ignoreNullFields" -> "true"))

  /** Reports table: one row per record with both JSON documents. */
  def reports(validated: DataFrame, runDatetime: String): DataFrame =
    validated.where(col("parse_ok"))
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        col("sha256"),
        etsReportJson(runDatetime).as("ets_report"),
        kpiReportJson(runDatetime).as("kpi_report"))

  /** The KPI ETS gate (`/root/reference/pywcmp/kpi.py:81-87` with
    * `--fail-on-ets`, default true): KPI evaluation is refused for records
    * that fail the schema-validation gate. The reference raises ValueError
    * per record; at table scale the refusal becomes a null kpi payload +
    * the schema-gate violation row that [[Validator.violations]] already
    * emits. */
  def withEtsGate(validated: DataFrame, failOnEts: Boolean = true): DataFrame =
    if (!failOnEts) validated
    else validated
      .withColumn("kpi_gated", col("validation.code") === "FAILED")
      .withColumn("kpi_tests",
        when(!col("kpi_gated"), col("kpi_tests")))
      .withColumn("kpi_summary",
        when(!col("kpi_gated"), col("kpi_summary")))

  /** Driver exit code semantics: the reference CLI exits with the FAILED
    * count (`/root/reference/pywcmp/ets.py:83-84`). A record that fails to
    * parse ABORTS the reference run (`json.loads` raises through
    * `parse_wcmp`, `/root/reference/pywcmp/util.py:203-219` — there is no
    * "count it as one failure" path), so any parse error here maps to the
    * abort code 255. Null-safe on empty input (exit 0). */
  def exitCode(validated: DataFrame): Int = {
    val row = validated.agg(
      coalesce(sum(col("ets_summary.FAILED")), lit(0L)).as("failed"),
      coalesce(sum(when(!col("parse_ok"), 1L).otherwise(0L)), lit(0L))
        .as("parse_errors")).collect()(0)
    if (row.getLong(1) > 0) 255
    else math.min(row.getLong(0), 255L).toInt
  }
}
