package graft

import org.apache.spark.sql.Row
import graft.engine.Validator
import graft.sources.RecordTable

/** KPI golden from the reference's own tests
  * (`/root/reference/tests/run_tests.py:211-228`) plus the per-KPI
  * decomposition pinned in FIXTURES.md §4. */
class KpiSpec extends SparkSpec {

  lazy val validated = Validator.validate(RecordTable.fixtures(spark))
    .select("path", "kpi_tests", "kpi_summary")
    .collect()
    .map(r => r.getString(0).stripPrefix("tests/data/") -> r).toMap

  def kpis(name: String): Map[String, Row] = {
    val r = validated(name)
    r.getSeq[Row](r.fieldIndex("kpi_tests"))
      .map(t => t.getString(0).split("/").last -> t).toMap
  }

  test("MapLinkProbe.fromTable fails fast on over-literal-sized probe " +
       "dims, pointing at the join path") {
    import org.apache.spark.sql.functions._
    val big = spark.range(graft.catalog.MapLinkProbe.MaxLiteralEntries + 1)
      .select(concat(lit("https://example.org/"), col("id")).as("href"),
        lit(true).as("accessible"), lit("text/html").as("mime"))
    val e = intercept[IllegalArgumentException] {
      graft.catalog.MapLinkProbe.fromTable(big)
    }
    assert(e.getMessage.contains("linkHealthJoin"))
    // literal-sized dims still work
    val small = spark.range(3)
      .select(concat(lit("https://example.org/"), col("id")).as("href"),
        lit(true).as("accessible"), lit("text/html").as("mime"))
    assert(graft.catalog.MapLinkProbe.fromTable(small)
      .entries.size == 3)
  }

  test("passing record: summary 32/32, 100%, grade A (run_tests.py:225-228)") {
    val r = validated("wcmp2-passing.json")
    val s = r.getStruct(r.fieldIndex("kpi_summary"))
    assert(s.getInt(s.fieldIndex("total")) == 32)
    assert(s.getInt(s.fieldIndex("score")) == 32)
    assert(s.getDouble(s.fieldIndex("percentage")) == 100.0)
    assert(s.getString(s.fieldIndex("grade")) == "A")
  }

  test("passing record: per-KPI decomposition (FIXTURES.md §4)") {
    val k = kpis("wcmp2-passing.json")
    def ts(name: String): (Int, Int) = {
      val t = k(name)
      (t.getInt(t.fieldIndex("total")), t.getInt(t.fieldIndex("score")))
    }
    assert(ts("good_quality_title") == (8, 8))
    assert(ts("good_quality_description") == (4, 4))
    assert(ts("time_intervals") == (3, 3))
    assert(ts("graphic_overview_for_metadata_records") == (0, 0))
    assert(ts("links_health") == (14, 14))
    assert(ts("contacts") == (3, 3))
    assert(ts("persistent_identifiers") == (0, 0))
  }

  test("KPI execution order is the reference's alphabetical dir() order " +
       "(kpi.py:503-508)") {
    val r = validated("wcmp2-passing.json")
    val ids = r.getSeq[Row](r.fieldIndex("kpi_tests"))
      .map(_.getString(0).split("/").last)
    assert(ids == Seq("contacts", "good_quality_description",
      "graphic_overview_for_metadata_records", "links_health",
      "persistent_identifiers", "time_intervals", "good_quality_title"))
  }

  test("kpi title quirk: emitted title field is the record's title " +
       "(kpi.py:100)") {
    val k = kpis("wcmp2-passing.json")
    val t = k("good_quality_title")
    assert(t.getString(t.fieldIndex("title")) ==
      "Surface weather observations")
  }

  test("per-test percentage null when total == 0 (kpi.py:535-538)") {
    val k = kpis("wcmp2-passing.json")
    val g = k("graphic_overview_for_metadata_records")
    assert(g.isNullAt(g.fieldIndex("percentage")))
  }

  test("failing record: title not sentence case costs a point " +
       "('Surface Weather Observations')") {
    val k = kpis("wcmp2-failing.json")
    val t = k("good_quality_title")
    // 'Weather Observations' capitalized != original -> sentence-case lost
    assert(t.getInt(t.fieldIndex("score")) == 7)
    assert(t.getSeq[String](t.fieldIndex("comments")) ==
      Seq("Title is not sentence case"))
  }

  test("failing record: contacts KPI 0/3 (roles [processor], no host)") {
    val k = kpis("wcmp2-failing.json")
    val c = k("contacts")
    assert(c.getInt(c.fieldIndex("total")) == 3)
    assert(c.getInt(c.fieldIndex("score")) == 0)
    assert(c.getSeq[String](c.fieldIndex("comments")) ==
      Seq("No host contact found"))
  }

  test("failing record: full KPI decomposition 25/30 (title 7/8 sentence " +
       "case, intervals 2/3 no resolution, links 12/12 with scheme-less " +
       "theme, contacts 0/3)") {
    val k = kpis("wcmp2-failing.json")
    def ts(name: String): (Int, Int) = {
      val t = k(name)
      (t.getInt(t.fieldIndex("total")), t.getInt(t.fieldIndex("score")))
    }
    assert(ts("good_quality_title") == (8, 7))
    assert(ts("good_quality_description") == (4, 4))
    // fixture drops `resolution` from time (diff vs passing)
    assert(ts("time_intervals") == (3, 2))
    assert(ts("graphic_overview_for_metadata_records") == (0, 0))
    // theme 1 lost its scheme -> pool has 6 http urls, not 7
    assert(ts("links_health") == (12, 12))
    assert(ts("contacts") == (3, 0))
    assert(ts("persistent_identifiers") == (0, 0))
    val r = validated("wcmp2-failing.json")
    val s = r.getStruct(r.fieldIndex("kpi_summary"))
    assert(s.getInt(s.fieldIndex("total")) == 30)
    assert(s.getInt(s.fieldIndex("score")) == 25)
    assert(s.getDouble(s.fieldIndex("percentage")) == 83.333)
    assert(s.getString(s.fieldIndex("grade")) == "A")
  }

  test("all single-failure fixtures keep the full 32/32 KPI score") {
    Seq("wcmp2-failing-created-none.json",
        "wcmp2-failing-invalid-centre-id.json",
        "wcmp2-failing-invalid-geometry-range.json",
        "wcmp2-failing-invalid-identifier-empty.json",
        "wcmp2-failing-invalid-identifier-space.json",
        "wcmp2-failing-invalid-link-channel-wis2-topic.json",
        "wcmp2-passing-test-centre-id.json").foreach { f =>
      val r = validated(f)
      val s = r.getStruct(r.fieldIndex("kpi_summary"))
      assert(s.getInt(s.fieldIndex("total")) == 32, f)
      assert(s.getInt(s.fieldIndex("score")) == 32, f)
      assert(s.getString(s.fieldIndex("grade")) == "A", f)
    }
  }

  test("summary comments clobber bug: last commented test's fields " +
       "(kpi.py:573-576)") {
    val r = validated("wcmp2-failing.json")
    val s = r.getStruct(r.fieldIndex("kpi_summary"))
    val lastCommented = s.getStruct(s.fieldIndex("comments"))
    // alphabetical kpi order => good_quality_title runs last; it is the
    // last one with comments on this record
    assert(lastCommented.getString(0).endsWith("good_quality_title"))
  }
}
