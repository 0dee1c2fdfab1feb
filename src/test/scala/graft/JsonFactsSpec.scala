package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.engine.Validator

/** Edge semantics of the single-tokenize parse kernel
  * ([[graft.expressions.JsonFacts]]): `json.loads` strictness for
  * parse_ok (the reference's parser,
  * `/root/reference/pywcmp/util.py:203-219`), duplicate-key last-wins,
  * non-object roots, and from_json-parity struct coercions. */
class JsonFactsSpec extends SparkSpec {
  import spark.implicits._

  private def facts(json: String): Row =
    Seq(json).toDF("content")
      .select(graft.expressions.JsonFacts.jsonFacts(col("content"))
        .as("f"))
      .select("f.parse_ok", "f.rec.id", "f.rec.properties.title")
      .collect().head

  private def gateCode(json: String): String = {
    val df = Seq(("r", "p", "c", "en", json))
      .toDF("repo", "path", "commit", "lang", "content")
    Validator.validate(df).select("validation.code").collect().head
      .getString(0)
  }

  test("trailing garbage fails the parse (json.loads strictness)") {
    assert(!facts("""{"id":"x"} trailing""").getBoolean(0))
  }

  test("scalar and array roots are valid JSON but fail the gate's " +
       "required checks") {
    for (root <- Seq("5", "\"str\"", "[1,2]")) {
      assert(facts(root).getBoolean(0), root)  // json.loads accepts
      assert(gateCode(root) == "FAILED", root) // gate: required members
    }
  }

  test("duplicate object keys parse last-wins, like Python json.loads") {
    // try_parse_json would have rejected this outright; json.loads keeps
    // the second properties object
    val r = facts(
      """{"properties":{"title":"first"},
        |"properties":{"title":"second"}}""".stripMargin.replace("\n", ""))
    assert(r.getBoolean(0))
    assert(r.getString(2) == "second")
  }

  test("from_json coercion parity: numbers/booleans to text") {
    val r = facts("""{"id": 5.50, "properties": {"title": true}}""")
    assert(r.getBoolean(0))
    assert(r.getString(1) == "5.5")   // float via Double.toString
    assert(r.getString(2) == "true")  // boolean literal text
  }

  test("container-to-string coercion serializes compactly") {
    val r = facts("""{"id": {"a": 1,  "b": [2, "x"]}}""")
    assert(r.getString(1) == """{"a":1,"b":[2,"x"]}""")
  }

  test("empty and whitespace-only input fail the parse") {
    for (s <- Seq("", "   ")) assert(!facts(s).getBoolean(0), s)
  }
}
