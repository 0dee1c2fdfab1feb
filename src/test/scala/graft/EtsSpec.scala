package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.engine.Validator
import graft.sources.RecordTable

/** The reference's own golden matrix
  * (`/root/reference/tests/run_tests.py:59-197`), fixture by fixture:
  * expected FAILED/PASSED counts over the 12 counted ETS tests, plus the
  * failing rule ids and (where the reference pins one) the exact message.
  */
class EtsSpec extends SparkSpec {

  lazy val validated = Validator.validate(RecordTable.fixtures(spark))
    .select("path", "parse_ok", "ets_tests", "ets_summary", "validation")
    .collect()
    .map(r => r.getString(0).stripPrefix("tests/data/") -> r).toMap

  def codes(name: String): (Int, Int, Int) = {
    val r = validated(name)
    val s = r.getStruct(r.fieldIndex("ets_summary"))
    (s.getInt(0), s.getInt(1), s.getInt(2)) // PASSED, FAILED, SKIPPED
  }

  def failures(name: String): Seq[(String, String)] = {
    val r = validated(name)
    r.getSeq[Row](r.fieldIndex("ets_tests"))
      .filter(_.getString(1) == "FAILED")
      .map(t => (t.getString(0).split("/").last, t.getString(2)))
  }

  test("passing record: 12 PASSED / 0 FAILED (run_tests.py:59-75)") {
    assert(codes("wcmp2-passing.json") == (12, 0, 0))
  }

  test("-test centre-id bypass: 12 PASSED (run_tests.py:77-88)") {
    assert(codes("wcmp2-passing-test-centre-id.json") == (12, 0, 0))
  }

  test("invalid centre-id: identifier fails (run_tests.py:90-98)") {
    assert(codes("wcmp2-failing-invalid-centre-id.json") == (11, 1, 0))
    assert(failures("wcmp2-failing-invalid-centre-id.json") ==
      Seq(("identifier", "Invalid centre_id: bad-centre-id")))
  }

  test("failing record: exactly 3 FAILED (run_tests.py:100-113)") {
    assert(codes("wcmp2-failing.json") == (9, 3, 0))
    // themes + data_policy certain; third pinned to links (FIXTURES.md §3)
    val fm: Map[String, String] = failures("wcmp2-failing.json").toMap
    assert(fm.keySet == Set("themes", "data_policy", "links"))
    assert(fm("themes") == "Missing scheme")
    assert(fm("data_policy") == "Missing data policy")
    assert(fm("links") == "invalid link relation download")
  }

  test("failing record fails the schema gate (run_tests.py:114-115)") {
    val r = validated("wcmp2-failing.json")
    val v = r.getStruct(r.fieldIndex("validation"))
    assert(v.getString(1) == "FAILED")
    // every other JSON fixture passes the gate
    RecordTable.fixtureNames.filter(n => n.endsWith(".json") &&
        n != "wcmp2-failing.json").foreach { n =>
      val rr = validated(n)
      assert(rr.getStruct(rr.fieldIndex("validation")).getString(1) ==
        "PASSED", s"gate should pass for $n")
    }
  }

  test("created 'None': created_datetime fails (run_tests.py:117-129)") {
    assert(codes("wcmp2-failing-created-none.json") == (11, 1, 0))
    assert(failures("wcmp2-failing-created-none.json") ==
      Seq(("record_created_datetime", "Invalid date-time format")))
  }

  test("invalid link channel topic: links fails (run_tests.py:131-146)") {
    assert(codes("wcmp2-failing-invalid-link-channel-wis2-topic.json") ==
      (11, 1, 0))
    assert(failures("wcmp2-failing-invalid-link-channel-wis2-topic.json") ==
      Seq(("links", "Invalid WIS2 topic for Pub/Sub link channel")))
  }

  test("space in local id: identifier fails (run_tests.py:148-163)") {
    assert(codes("wcmp2-failing-invalid-identifier-space.json") == (11, 1, 0))
    assert(failures("wcmp2-failing-invalid-identifier-space.json") ==
      Seq(("identifier", "spaces in local identifier")))
  }

  test("empty local id: identifier fails (run_tests.py:165-180)") {
    assert(codes("wcmp2-failing-invalid-identifier-empty.json") == (11, 1, 0))
    assert(failures("wcmp2-failing-invalid-identifier-empty.json") ==
      Seq(("identifier", "Empty / null local identifier")))
  }

  test("geometry out of range: extent_geospatial fails, and carries NO " +
       "message (messsage typo, ets.py:256) (run_tests.py:182-197)") {
    assert(codes("wcmp2-failing-invalid-geometry-range.json") == (11, 1, 0))
    assert(failures("wcmp2-failing-invalid-geometry-range.json") ==
      Seq(("extent_geospatial", null)))
  }

  test("non-JSON content: parse error, like parse_wcmp RuntimeError " +
       "(run_tests.py:254-260)") {
    val r = validated("not-json.csv")
    assert(!r.getBoolean(r.fieldIndex("parse_ok")))
  }

  test("violations DF carries exactly the expected rows") {
    val v = Validator.violations(
      Validator.validate(RecordTable.fixtures(spark)))
    val byRule = v.groupBy("rule_id").count().collect()
      .map(r => r.getString(0).split("/").last -> r.getLong(1)).toMap
    assert(byRule("identifier") == 3)     // bad-centre, space, empty
    assert(byRule("record_created_datetime") == 1)
    assert(byRule("links") == 2)          // bad rel + bad topic
    assert(byRule("themes") == 1)
    assert(byRule("data_policy") == 1)
    assert(byRule("extent_geospatial") == 1)
    assert(byRule("parse_error") == 1)
    assert(byRule("validation") == 1)
  }
}
