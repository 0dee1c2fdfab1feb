package graft

import org.apache.spark.sql.Row
import graft.engine.Validator

/** Negative goldens for the deepened schema gate: NON-fixture invalid
  * records (missing members, wrong JSON types, bad enum, short arrays)
  * must FAIL with per-error diagnostics, while structurally-valid records
  * pass. Fixture behavior is pinned separately in EtsSpec ("failing
  * record fails the schema gate"). Mirrors
  * `/root/reference/pywcmp/wcmp2/ets.py:116-148` (iter_errors over the
  * bundled schema; message `'{n} error(s)'` + errors list).
  */
class SchemaGateSpec extends SparkSpec {
  import spark.implicits._

  private val valid =
    """{"id":"urn:wmo:md:de-dwd:x","conformsTo":
      |["http://wis.wmo.int/spec/wcmp/2/conf/core"],"type":"Feature",
      |"time":{"interval":["2024-01-01","2024-12-31"]},"geometry":null,
      |"properties":{"title":"t","description":"d","type":"dataset",
      |"created":"2024-01-01T00:00:00Z",
      |"contacts":[{"name":"c","roles":["host"]}],
      |"themes":[{"concepts":[{"id":"weather"}],"scheme":"http://x/s"}]},
      |"links":[{"rel":"items","href":"http://example.org/x"}]}"""
      .stripMargin.replace("\n", "")

  private def mutate(remove: String = null,
                     replace: (String, String) = null): String = {
    var s = valid
    if (remove != null) {
      // drop `"key":<value>,` — keys in the template are unique
      val i = s.indexOf("\"" + remove + "\":")
      require(i >= 0)
      var depth = 0; var j = i + remove.length + 3
      var done = false
      while (!done) {
        s.charAt(j) match {
          case '{' | '[' => depth += 1
          case '}' | ']' => if (depth == 0) done = true else depth -= 1
          case ',' if depth == 0 => done = true
          case _ =>
        }
        if (!done) j += 1
      }
      s = s.substring(0, i) + s.substring(if (s.charAt(j) == ',') j + 1 else j)
    }
    if (replace != null) s = s.replace(replace._1, replace._2)
    s
  }

  private def gate(json: String): Row = {
    val df = Seq(("r", "p", "c", "en", json))
      .toDF("repo", "path", "commit", "lang", "content")
    Validator.validate(df).select("validation.*").collect().head
  }
  private def errs(json: String): Seq[String] = {
    val r = gate(json)
    if (r.isNullAt(r.fieldIndex("errors"))) Seq.empty
    else r.getSeq[String](r.fieldIndex("errors"))
  }

  test("structurally valid record passes the gate with no errors") {
    val r = gate(valid)
    assert(r.getString(r.fieldIndex("code")) == "PASSED")
    assert(r.isNullAt(r.fieldIndex("message")))
    assert(errs(valid).isEmpty)
  }

  test("pattern: non-URN id fails; the prefix-only looseness matches the " +
       "reference (empty/space local identifiers pass the schema)") {
    assert(errs(mutate(replace =
      "\"id\":\"urn:wmo:md:de-dwd:x\"" -> "\"id\":\"foo\"")) ==
      Seq("$.id: 'foo' does not match '^urn:wmo:md:'"))
    // reference run_tests.py:148-181: only the ETS identifier test fails
    // for these shapes — the schema gate must keep passing them
    assert(errs(mutate(replace =
      "\"id\":\"urn:wmo:md:de-dwd:x\"" ->
      "\"id\":\"urn:wmo:md:de-dwd:\"")).isEmpty)
    assert(errs(mutate(replace =
      "\"id\":\"urn:wmo:md:de-dwd:x\"" ->
      "\"id\":\"urn:wmo:md:de-dwd:a b\"")).isEmpty)
    // pattern applies to string instances only: a numeric id reports the
    // type error alone (jsonschema semantics)
    assert(errs(mutate(replace =
      "\"id\":\"urn:wmo:md:de-dwd:x\"" -> "\"id\":7")) ==
      Seq("$.id: is not of type 'string'"))
  }

  test("uniqueItems: duplicated conformsTo entries fail even when the " +
       "core class is present") {
    val core = "http://wis.wmo.int/spec/wcmp/2/conf/core"
    assert(errs(mutate(replace =
      s"""["$core"]""" -> s"""["$core","$core"]""")) ==
      Seq("$.conformsTo: has non-unique elements"))
    // distinct entries stay clean
    assert(errs(mutate(replace =
      s"""["$core"]""" -> s"""["$core","http://x/other"]""")).isEmpty)
  }

  test("new-check edges: dup-key last-wins feeds the pattern; coerced " +
       "scalar leaves count as duplicates; container/null leaves don't") {
    // duplicate `id` keys: json.loads keeps the LAST value — the pattern
    // must judge that one
    assert(errs("{\"id\":\"urn:wmo:md:de-dwd:first\"," + valid.drop(1)
      .replace("\"id\":\"urn:wmo:md:de-dwd:x\"", "\"id\":\"oops\"")) ==
      Seq("$.id: 'oops' does not match '^urn:wmo:md:'"))
    val core = "http://wis.wmo.int/spec/wcmp/2/conf/core"
    // numeric items coerce to string leaves on BOTH engines: [7, 7] is
    // non-unique (and also fails the contains-core check)
    assert(errs(mutate(replace =
      s"""["$core"]""" -> s"""["$core",7,7]""")) ==
      Seq("$.conformsTo: has non-unique elements"))
    // container leaves compare by MINIFIED text (source formatting
    // differences collapse), matching jsonschema's JSON equality for
    // identically-keyed objects; JSON nulls are erased to SQL NULL on
    // both engines and skipped — documented approximation
    assert(errs(mutate(replace =
      s"""["$core"]""" -> s"""["$core",{"a":1},{"a": 1}]""")) ==
      Seq("$.conformsTo: has non-unique elements"))
    assert(errs(mutate(replace =
      s"""["$core"]""" -> s"""["$core",{"a":1},{"a":2},null,null]"""))
      .isEmpty)
  }

  test("uniqueItems beyond the pairwise bound (hash-set path, >32 " +
       "elements): same verdict both sides of the cutover") {
    val core = "http://wis.wmo.int/spec/wcmp/2/conf/core"
    def arr(n: Int, dup: Boolean) = {
      val xs = (1 to n).map(i => s""""http://x/c$i"""")
      (s""""$core"""" +: (if (dup) xs :+ xs.head else xs))
        .mkString("[", ",", "]")
    }
    // 40 distinct entries (plus core): clean — and LINEAR, not quadratic
    assert(errs(mutate(replace = s"""["$core"]""" -> arr(40, dup = false)))
      .isEmpty)
    // 40 entries with one repeat: non-unique via the hash-set path
    assert(errs(mutate(replace = s"""["$core"]""" -> arr(40, dup = true))) ==
      Seq("$.conformsTo: has non-unique elements"))
    // the pairwise path (n <= 32) agrees on the same shape
    assert(errs(mutate(replace = s"""["$core"]""" -> arr(20, dup = true))) ==
      Seq("$.conformsTo: has non-unique elements"))
  }

  test("format is NOT asserted — parity with Draft202012Validator " +
       "without a format_checker (ets.py:137)") {
    // a malformed href URI raises no schema error in pywcmp (Draft
    // 2020-12 format is annotation-only there); the gate must agree
    assert(errs(mutate(replace =
      "\"href\":\"http://example.org/x\"" ->
      "\"href\":\"not a uri at all \\u0000\"")).isEmpty)
  }

  test("missing contacts -> required-property error") {
    assert(errs(mutate(remove = "contacts")) ==
      Seq("$.properties: 'contacts' is a required property"))
  }

  test("empty contacts / themes / links -> too short") {
    assert(errs(mutate(replace =
      "\"contacts\":[{\"name\":\"c\",\"roles\":[\"host\"]}]" ->
      "\"contacts\":[]")) == Seq("$.properties.contacts: [] is too short"))
    assert(errs(mutate(replace =
      "\"themes\":[{\"concepts\":[{\"id\":\"weather\"}],\"scheme\":\"http://x/s\"}]" ->
      "\"themes\":[]")) == Seq("$.properties.themes: [] is too short"))
    assert(errs(mutate(replace =
      "\"links\":[{\"rel\":\"items\",\"href\":\"http://example.org/x\"}]" ->
      "\"links\":[]")) == Seq("$.links: [] is too short"))
  }

  // ---- per-item subschemas (round 3): links / contacts / themes --------

  test("number-typed and missing link href; missing rel") {
    assert(errs(mutate(replace =
      "\"href\":\"http://example.org/x\"" -> "\"href\":123")) ==
      Seq("$.links[0].href: is not of type 'string'"))
    assert(errs(mutate(replace =
      ",\"href\":\"http://example.org/x\"" -> "")) ==
      Seq("$.links[0]: 'href' is a required property"))
    assert(errs(mutate(replace = "\"rel\":\"items\"," -> "")) ==
      Seq("$.links[0]: 'rel' is a required property"))
    assert(errs(mutate(replace = "\"rel\":\"items\"" -> "\"rel\":null")) ==
      Seq("$.links[0].rel: is not of type 'string'"))
  }

  test("contacts entry missing required members / mistyped roles") {
    assert(errs(mutate(replace = ",\"roles\":[\"host\"]" -> "")) ==
      Seq("$.properties.contacts[0]: 'roles' is a required property"))
    assert(errs(mutate(replace = "\"roles\":[\"host\"]" ->
      "\"roles\":\"host\"")) ==
      Seq("$.properties.contacts[0].roles: is not of type 'array'"))
    assert(errs(mutate(replace = "\"name\":\"c\"," -> "")) ==
      Seq("$.properties.contacts[0]: is not valid under any of " +
        "the given schemas"))
    // a second, valid contact must not mask the first item's error
    assert(errs(mutate(replace =
      "\"contacts\":[{\"name\":\"c\",\"roles\":[\"host\"]}]" ->
      (""""contacts":[{"name":"c"},""" +
        """{"organization":"o","roles":["host"]}]"""))) ==
      Seq("$.properties.contacts[0]: 'roles' is a required property"))
  }

  test("theme item shape: concepts/scheme required, concept id required") {
    assert(errs(mutate(replace = "\"concepts\":[{\"id\":\"weather\"}]," -> ""))
      == Seq("$.properties.themes[0]: 'concepts' is a required property"))
    assert(errs(mutate(replace = ",\"scheme\":\"http://x/s\"" -> "")) ==
      Seq("$.properties.themes[0]: 'scheme' is a required property"))
    assert(errs(mutate(replace = "\"scheme\":\"http://x/s\"" ->
      "\"scheme\":7")) ==
      Seq("$.properties.themes[0].scheme: is not of type 'string'"))
    assert(errs(mutate(replace = "\"concepts\":[{\"id\":\"weather\"}]" ->
      "\"concepts\":[]")) ==
      Seq("$.properties.themes[0].concepts: [] is too short"))
    assert(errs(mutate(replace = "\"concepts\":[{\"id\":\"weather\"}]" ->
      "\"concepts\":{\"id\":\"weather\"}")) ==
      Seq("$.properties.themes[0].concepts: is not of type 'array'"))
    assert(errs(mutate(replace = "{\"id\":\"weather\"}" ->
      "{\"label\":\"weather\"}")) ==
      Seq("$.properties.themes[0].concepts[0]: " +
        "'id' is a required property"))
    assert(errs(mutate(replace = "{\"id\":\"weather\"}" ->
      "{\"id\":[\"weather\"]}")) ==
      Seq("$.properties.themes[0].concepts[0].id: is not of type 'string'"))
    assert(errs(mutate(replace = "\"concepts\":[{\"id\":\"weather\"}]" ->
      "\"concepts\":[{\"id\":\"weather\"},\"oops\"]")) ==
      Seq("$.properties.themes[0].concepts[1]: is not of type 'object'"))
  }

  test("wrong-typed time (string) -> type error; null time passes") {
    assert(errs(mutate(replace =
      "\"time\":{\"interval\":[\"2024-01-01\",\"2024-12-31\"]}" ->
      "\"time\":\"2024\"")) ==
      Seq("$.time: is not of type 'object', 'null'"))
    assert(errs(mutate(replace =
      "\"time\":{\"interval\":[\"2024-01-01\",\"2024-12-31\"]}" ->
      "\"time\":null")).isEmpty)
  }

  test("bad type enum and non-string id") {
    assert(errs(mutate(replace = "\"type\":\"Feature\"" ->
      "\"type\":\"feature\"")) == Seq("$.type: 'Feature' was expected"))
    assert(errs(mutate(replace = "\"id\":\"urn:wmo:md:de-dwd:x\"" ->
      "\"id\":123")) == Seq("$.id: is not of type 'string'"))
  }

  test("missing conformsTo core class; wrong-typed created") {
    assert(errs(mutate(replace =
      "\"conformsTo\":[\"http://wis.wmo.int/spec/wcmp/2/conf/core\"]" ->
      "\"conformsTo\":[\"http://example.org/other\"]")) ==
      Seq("$.conformsTo: does not contain " +
        "'http://wis.wmo.int/spec/wcmp/2/conf/core'"))
    assert(errs(mutate(replace =
      "\"created\":\"2024-01-01T00:00:00Z\"" -> "\"created\":20240101")) ==
      Seq("$.properties.created: is not of type 'string'"))
  }

  test("mistyped properties parent: one error, no descent into children") {
    assert(errs(mutate(replace = "\"properties\":{" -> "\"properties\":[{"
      ).replace("]},\"links\"", "]}],\"links\"")) ==
      Seq("$.properties: is not of type 'object'"))
  }

  test("multiple errors -> '{n} error(s)' message, all errors listed") {
    val bad = mutate(remove = "contacts", replace =
      "\"type\":\"Feature\"" -> "\"type\":\"feature\"")
    val r = gate(bad)
    assert(r.getString(r.fieldIndex("code")) == "FAILED")
    assert(r.getString(r.fieldIndex("message")) == "2 error(s)")
    assert(errs(bad).toSet == Set(
      "$.type: 'Feature' was expected",
      "$.properties: 'contacts' is a required property"))
  }
}
