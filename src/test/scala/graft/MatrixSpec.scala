package graft

import org.apache.spark.sql.functions._

/** The driver-contract verdict matrices (q_ets_matrix / q_kpi_matrix):
  * closed-form expectations from the mutation-bucket design
  * (RecordTable.synthesize: buckets 0-13 pass everything, 14-19 each fail
  * exactly one known ETS rule) plus the fixture rows. The full per-cell
  * cross-check against the independent DuckDB SQL re-implementation is
  * the driver's oracle gate; this spec pins the Spark side's shape and
  * the bucket accounting so a generator or catalog regression is caught
  * in-tree. */
class MatrixSpec extends SparkSpec {

  private lazy val ets =
    SparkEntry.queries("q_ets_matrix")(spark, "/tmp").cache()
  private lazy val kpi =
    SparkEntry.queries("q_kpi_matrix")(spark, "/tmp").cache()

  test("ets matrix: 3016 rows, parse failures = the non-JSON fixture") {
    assert(ets.count() == 3016) // 3000 synth + 10 fixtures + 6 gate edges
    val parseFails = ets.where(!col("parse_ok")).select("path")
      .collect().map(_.getString(0)).toSeq
    assert(parseFails == Seq("tests/data/not-json.csv"))
  }

  test("ets matrix: per-test FAILED counts match the bucket design") {
    val n = 3000L
    def failed(t: String): Long = ets.where(col(t) === "FAILED").count()
    def bucketRows(b: Int): Long = n / 20 + (if (n % 20 > b) 1L else 0L)
    // synthesized: buckets 14 & 15 fail identifier; fixtures add the
    // failing/invalid-centre/empty/space identifier records; the two
    // bad-id gate-edge records (non-URN, numeric) also fail it
    assert(failed("identifier") == bucketRows(14) + bucketRows(15) + 3 + 2)
    // bucket 16 (created "None") + the created-none fixture
    assert(failed("created_datetime") == bucketRows(16) + 1)
    // bucket 17 (lon -242) + the geometry-range fixture
    assert(failed("extent_geospatial") == bucketRows(17) + 1)
    // bucket 18 (policy key removed) + the failing fixture
    assert(failed("data_policy") == bucketRows(18) + 1)
    // bucket 19 (rel 'download') + the failing and bad-channel fixtures
    assert(failed("links") == bucketRows(19) + 2)
    // the main failing fixture is the only themes failure
    assert(failed("themes") == 1)
    // gate failures: the failing fixture + 5 of the 6 gate-edge records
    // (pattern x2 incl. the numeric-id type error, uniqueItems x3; the
    // duplicated-nulls record must NOT fire)
    assert(ets.where(col("validation") === "FAILED").count() == 6)
    val edges = ets.where(col("path").startsWith("gate-edges/"))
      .select("path", "validation").collect()
      .map(r => r.getString(0).split('/').last -> r.getString(1)).toMap
    assert(edges == Map(
      "edge-id-pattern.json" -> "FAILED",
      "edge-id-number.json" -> "FAILED",
      "edge-conforms-dup.json" -> "FAILED",
      "edge-conforms-dup-int.json" -> "FAILED",
      "edge-conforms-objs.json" -> "FAILED",
      "edge-conforms-nulls.json" -> "PASSED"))
    // constant-pass tests never fail
    for (t <- Seq("conformance", "description", "extent_temporal", "title"))
      assert(failed(t) == 0, t)
  }

  test("kpi matrix: summary equals the per-KPI sums; grades are sane") {
    val bad = kpi.where(col("parse_ok") &&
      (col("sum_total") =!= col("contacts_total") + col("description_total") +
        col("graphic_total") + col("links_total") + col("pids_total") +
        col("time_total") + col("title_total") ||
       col("sum_score") =!= col("contacts_score") + col("description_score") +
        col("graphic_score") + col("links_score") + col("pids_score") +
        col("time_score") + col("title_score"))).count()
    assert(bad == 0)
    // every passing-bucket synthesized row keeps the full 32/32 score
    val perfect = kpi.where(col("sum_total") === 32 && col("sum_score") === 32)
    assert(perfect.count() >= 3000 * 14 / 20)
    assert(kpi.where(col("grade") === "A").count() >= perfect.count())
  }
}
