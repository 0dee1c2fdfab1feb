package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.io.Source

/** The engine's input table `(repo, path, commit, lang, content)`
  * (BASELINE.json input_hint; FIXTURES.md §1).
  *
  * Two sources:
  *  - [[fixtures]]: the 9 reference fixture records + the non-JSON file,
  *    embedded verbatim from `/root/reference/tests/data/` — the
  *    conformance corpus.
  *  - [[synthesize]]: a deterministic, seed-free generator that expands the
  *    passing fixture into N rows by per-row text mutation. Generation is a
  *    `spark.range` projection (distributed, codegen'd, no driver loop), so
  *    the same generator that makes 2k test rows makes 10^9 bench rows.
  *    Mutation buckets have exactly computable expected verdicts, so scale
  *    tests can assert per-partition counts in closed form.
  */
object RecordTable {

  val columns = Seq("repo", "path", "commit", "lang", "content")

  val fixtureNames: Seq[String] = Seq(
    "wcmp2-passing.json",
    "wcmp2-passing-test-centre-id.json",
    "wcmp2-failing.json",
    "wcmp2-failing-created-none.json",
    "wcmp2-failing-invalid-centre-id.json",
    "wcmp2-failing-invalid-geometry-range.json",
    "wcmp2-failing-invalid-identifier-empty.json",
    "wcmp2-failing-invalid-identifier-space.json",
    "wcmp2-failing-invalid-link-channel-wis2-topic.json",
    "not-json.csv")

  def fixtureContent(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Deterministic sha-like commit id for a path. */
  private def pseudoCommit(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def fixtures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val langs = Seq("en", "fr", "de", "es")
    fixtureNames.zipWithIndex.map { case (name, i) =>
      ("wmo-im/wcmp2-fixtures", s"tests/data/$name", pseudoCommit(name),
        langs(i % langs.size), fixtureContent(name))
    }.toDF(columns: _*)
  }

  /** Mutation buckets (i mod 20) — FIXTURES.md §5. Buckets 0-13 pass all 12
    * ETS tests; 14-19 each fail exactly one known rule. `lang` is skewed
    * 70/10/10/10 to exercise AQE/salting on the dataset-level aggs. */
  val failingBucketRules: Map[Int, String] = Map(
    14 -> "identifier",           // bad centre id
    15 -> "identifier",           // space in local id
    16 -> "record_created_datetime", // created = "None"
    17 -> "extent_geospatial",    // lon out of range
    18 -> "data_policy",          // wmo:dataPolicy key removed
    19 -> "links")                // rel -> unknown 'download'

  def synthesize(spark: SparkSession, n: Long,
                 partitions: Int = 0): DataFrame = {
    val template = fixtureContent("wcmp2-passing.json")
    // 4 waves per core by default: a single task wave (range's default =
    // defaultParallelism) lets any per-task skew idle whole threads
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism * 4
    val base = spark.range(0, n, 1, parts).toDF("i")

    def rep(c: org.apache.spark.sql.Column, s: String, r: org.apache.spark.sql.Column) =
      call_function("replace", c, lit(s), r)

    val bucket = pmod(col("i"), lit(20))
    val idLine = "urn:wmo:md:ca-eccc-msc:weather.observations.swob-realtime"
    // unique local identifier per row (bucket 15 re-inserts a space)
    val localId = concat(lit("observations.r"), col("i"))
    val newId = concat(
      when(bucket === 14, "urn:wmo:md:bad-centre-id:")
        .otherwise("urn:wmo:md:ca-eccc-msc:"),
      when(bucket === 15, concat(lit("obs r"), col("i"))).otherwise(localId))

    val content0 = rep(lit(template), idLine, newId)
    val content1 = when(bucket === 16,
        rep(content0, "\"created\": \"2018-01-01T11:11:11Z\"",
          lit("\"created\": \"None\"")))
      .when(bucket === 17, rep(content0, "-142,", lit("-242,")))
      .when(bucket === 18,
        regexp_replace(content0, ",\\s*\"wmo:dataPolicy\": \"core\"", ""))
      .when(bucket === 19, rep(content0, "\"rel\": \"data\",",
        lit("\"rel\": \"download\",")))
      .otherwise(content0)

    val lang = when(pmod(col("i"), lit(10)) < 7, "en")
      .when(pmod(col("i"), lit(10)) === 7, "fr")
      .when(pmod(col("i"), lit(10)) === 8, "de")
      .otherwise("zh")

    base.select(
      concat(lit("r"), pmod(col("i"), lit(1000))).as("repo"),
      concat(lit("records/"), col("i"), lit(".json")).as("path"),
      sha2(concat(lit("commit-"), col("i")), 256).substr(1, 40).as("commit"),
      lang.as("lang"),
      content1.as("content"))
  }

  /** Hand-crafted records exercising the schema gate's Draft 2020-12
    * pattern / uniqueItems classes (and their interplay with the ETS
    * identifier test) — unioned into the verdict-matrix oracle dump so
    * the DuckDB twin independently re-derives the new checks instead of
    * trivially passing them. Shapes: non-URN string id (pattern fires),
    * numeric id (type error, pattern suppressed), duplicated conformsTo
    * strings / coerced ints / minified-equal objects (uniqueItems fires),
    * duplicated JSON nulls (erased to SQL NULL on both engines — must
    * NOT fire). */
  def gateEdgeRecords(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val template = fixtureContent("wcmp2-passing.json")
    val core = "http://wis.wmo.int/spec/wcmp/2/conf/core"
    val idLine =
      "\"urn:wmo:md:ca-eccc-msc:weather.observations.swob-realtime\""
    def conforms(items: String) =
      template.replace("\"" + core + "\"", items)
    val rows = Seq(
      ("edge-id-pattern", template.replace(idLine, "\"not-a-urn\"")),
      ("edge-id-number", template.replace(idLine, "12345")),
      ("edge-conforms-dup", conforms(s""""$core", "$core"""")),
      ("edge-conforms-dup-int", conforms(s""""$core", 7, 7""")),
      ("edge-conforms-objs", conforms(s""""$core", {"a": 1}, {"a":1}""")),
      ("edge-conforms-nulls", conforms(s""""$core", null, null""")))
    rows.map { case (name, content) =>
      ("edge", s"gate-edges/$name.json", name, "en", content)
    }.toDF("repo", "path", "commit", "lang", "content")
  }

  /** Expected ETS-failing rows for a synthesized table of n rows (6 of
    * every 20 buckets fail exactly one test each). */
  def expectedFailing(n: Long): Long = failingBucketRules.keys.toSeq
    .map(b => n / 20 + (if (n % 20 > b) 1L else 0L)).sum
}
