package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.Validator
import graft.sources.{RecordTable, UrlSource}

/** S2 URL scan: the PRODUCTION transport (JavaNetFetcher) driven over
  * file:// URLs (same java.net code path as http://; this sandbox has no
  * egress). Fetched tables flow straight into the validator; fetch
  * failures become rows, not exceptions. */
class UrlSourceSpec extends SparkSpec {

  test("fetchTable: production fetcher over file:// URLs -> records " +
       "table -> full validation") {
    val dir = Files.createTempDirectory("urlsrc")
    val names = Seq("wcmp2-passing.json", "wcmp2-failing.json")
    val urls = names.map { n =>
      val f = dir.resolve(n)
      Files.writeString(f, RecordTable.fixtureContent(n))
      f.toUri.toString // file:///...
    } :+ dir.resolve("missing.json").toUri.toString

    val fetched = UrlSource.fetchTable(spark, urls)
    assert(fetched.columns.toSeq == Seq("repo", "path", "commit", "lang",
      "content", "fetch_error"))
    val rows = fetched.collect().map(r =>
      r.getString(1).split('/').last -> r).toMap
    assert(rows.size == 3)
    assert(rows("missing.json").getString(5) != null)   // fetch_error set
    assert(rows("missing.json").isNullAt(4))            // no content
    assert(rows("wcmp2-passing.json").isNullAt(5))
    assert(rows("wcmp2-passing.json").getString(4)
      .contains("urn:wmo:md:ca-eccc-msc"))

    // straight into the engine: fetched records validate identically to
    // the classpath fixtures; the failed fetch surfaces as a parse_error
    val validated = Validator.validate(fetched.drop("fetch_error"))
    val byPath = validated
      .select(col("path"), col("parse_ok"),
        col("ets_summary.FAILED").as("failed")).collect()
      .map(r => r.getString(0).split('/').last ->
        (r.getBoolean(1), if (r.isNullAt(2)) -1 else r.getInt(2))).toMap
    assert(byPath("wcmp2-passing.json") == ((true, 0)))
    assert(byPath("wcmp2-failing.json") == ((true, 3)))
    assert(byPath("missing.json") == ((false, -1)))
  }

  test("invalid URL syntax becomes a fetch_error row, not an exception") {
    val fetched = UrlSource.fetchTable(spark,
      Seq("not a url at all", "unknown-scheme://x/y"))
    val errs = fetched.select("fetch_error").collect().map(_.getString(0))
    assert(errs.length == 2 && errs.forall(_ != null))
  }
}
