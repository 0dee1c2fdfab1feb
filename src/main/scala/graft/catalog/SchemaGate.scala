package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The gating schema-validation test (`/root/reference/pywcmp/wcmp2/
  * ets.py:116-148`): the reference validates each record against the
  * bundled WCMP2 Draft 2020-12 JSON Schema with
  * `Draft202012Validator.iter_errors`, reporting EVERY error as
  * `f'{error.json_path}: {error.message}'`, a summary message
  * `f'{len(errors)} error(s)'` and the errors array (`ets.py:139-146`).
  *
  * Here the schema's required / type / enum / minItems constraints are
  * compiled into Catalyst predicates that RE-USE the parse artifacts the
  * engine already materializes per row — every gate channel below comes
  * from the single-tokenize [[graft.expressions.JsonFacts]] kernel or the
  * already-parsed `rec` struct, so the gate adds ZERO extra scans of the
  * document text (naive per-check `variant_get` formulations measured
  * 40-45% of engine throughput; the earlier multi-artifact formulation —
  * json_object_keys x2 + json_tuple + variant probes — measured ~60% of
  * hot-path CPU in redundant tokenization):
  *
  *  - presence: the kernel's `root_keys` / `props_keys` arrays — the
  *    missing-vs-null channel `from_json` cannot provide;
  *  - container types + minItems: null-ness and `size` of the already-
  *    parsed `rec` struct fields (`from_json` PERMISSIVE nulls a field on
  *    type mismatch, and JSON-Schema emits the same "is not of type"
  *    error for explicit null, so the two collapsing is CORRECT here);
  *  - nullable objects (`time`, `geometry`): first char of the kernel's
  *    raw value slice distinguishes explicit null (SQL NULL) from a
  *    mistyped scalar/array ('{' reliably marks an object);
  *  - string-typed members (id, title, description, type, created): the
  *    only checks that need true JSON types (Hive-style JSON functions
  *    and lenient `from_json` both erase string-vs-number) — the
  *    kernel's per-member is-string tags.
  *
  * Coverage: the root-level and properties-level constraints of the WCMP2
  * record schema (which profiles OGC API - Records `recordGeoJSON`):
  * required members, their JSON types, the `Feature` type const, the
  * conformsTo core-class containment, the minItems floors on links /
  * contacts / themes — AND the per-item subschemas of those three arrays
  * (the checks `iter_errors` reports item-by-item, `ets.py:128-148`):
  *
  *  - `links[i]`: object; `href` and `rel` required and string-typed
  *    (WCMP2 profiles the OGC Records link object and additionally
  *    requires `rel`; the ETS links test reads `link['rel']` unguarded,
  *    `ets.py:460`, which only a schema guarantee makes safe)
  *  - `contacts[i]`: object; `roles` required and array-typed
  *    (`ets.py:380` reads `contact['roles']` unguarded); anyOf
  *    name/organization (OGC API - Records `contact.yaml`)
  *  - `themes[i]`: object; `concepts` required, array-typed, minItems 1;
  *    `scheme` required and string-typed; `concepts[j]`: object with
  *    required string `id` (OGC API - Records `theme.yaml` requires
  *    concepts+scheme; concepts items require `id`)
  *
  * Per-item presence/type checks are emitted by the same facts-kernel
  * tokenize pass (missing member vs explicit JSON null distinguished
  * during the walk — the channel the earlier `array<variant>`-slice
  * formulation provided, whose interpreted per-item lambdas measured
  * ~30% of engine throughput at compute-bound thread counts). Error
  * strings follow the json_path convention (0-based
  * indices like jsonschema); the message text is a close paraphrase of
  * jsonschema's (the exact Python repr of offending values is not
  * reproduced, and an item failing anyOf gets the generic "is not valid
  * under any of the given schemas"). A non-object root (valid JSON
  * scalar/array) reports the member-level required errors rather than
  * jsonschema's single root type error.
  */
object SchemaGate {

  private val Core = "http://wis.wmo.int/spec/wcmp/2/conf/core"

  /** All schema errors for one record as `array<string>`, in document
    * order of the compiled constraints.
    *
    * @param facts [[graft.expressions.JsonFacts]] struct attribute (the
    *              single-tokenize kernel: key channels, raw time/geometry
    *              slices, string-type tags, per-item diagnostics)
    * @param rec   `from_json(content, Wcmp2Schema.root)` attribute
    */
  def errors(facts: Column, rec: Column): Column = {
    val rootKeys = facts.getField("root_keys")
    val propsKeys = facts.getField("props_keys")
    val timeRaw = facts.getField("time_raw")
    val geomRaw = facts.getField("geom_raw")
    def hasRoot(m: String): Column =
      coalesce(array_contains(rootKeys, m), lit(false))
    def hasProp(m: String): Column =
      coalesce(array_contains(propsKeys, m), lit(false))
    val propsOk = propsKeys.isNotNull
    // present-with-JSON-string-value tags from the facts kernel (the only
    // checks needing true JSON types; previously one schema_of_variant
    // probe each over the record variant)
    val strTag = Map(
      "id" -> facts.getField("id_str"),
      "title" -> facts.getField("title_str"),
      "description" -> facts.getField("desc_str"),
      "type" -> facts.getField("type_str"),
      "created" -> facts.getField("created_str"))
    def vstr(m: String): Column = strTag(m)
    val props = rec.getField("properties")

    def reqRoot(m: String): (Column, Column) =
      (!hasRoot(m), lit(s"$$: '$m' is a required property"))
    def reqProp(m: String): (Column, Column) =
      (propsOk && !hasProp(m),
        lit(s"$$.properties: '$m' is a required property"))
    def strRoot(m: String): (Column, Column) =
      (hasRoot(m) && !vstr(m),
        lit(s"$$.$m: is not of type 'string'"))
    def strProp(m: String): (Column, Column) =
      (propsOk && hasProp(m) && !vstr(m),
        lit(s"$$.properties.$m: is not of type 'string'"))
    def nullableObj(m: String, raw: Column): (Column, Column) =
      (hasRoot(m) && raw.isNotNull && !raw.startsWith("{"),
        lit(s"$$.$m: is not of type 'object', 'null'"))
    def arrProp(m: String): Seq[(Column, Column)] = Seq(
      (propsOk && hasProp(m) && props.getField(m).isNull,
        lit(s"$$.properties.$m: is not of type 'array'")),
      (propsOk && hasProp(m) && size(props.getField(m)) < 1,
        lit(s"$$.properties.$m: [] is too short")))

    val checks: Seq[(Column, Column)] = Seq(
      reqRoot("id"), strRoot("id"),
      reqRoot("conformsTo"),
      (hasRoot("conformsTo") && rec.getField("conformsTo").isNull,
        lit("$.conformsTo: is not of type 'array'")),
      (hasRoot("conformsTo") && rec.getField("conformsTo").isNotNull &&
         !coalesce(array_contains(rec.getField("conformsTo"), Core),
           lit(false)),
        lit(s"$$.conformsTo: does not contain '$Core'")),
      reqRoot("type"),
      (hasRoot("type") && !(rec.getField("type") <=> "Feature"),
        lit("$.type: 'Feature' was expected")),
      reqRoot("time"), nullableObj("time", timeRaw),
      reqRoot("geometry"), nullableObj("geometry", geomRaw),
      reqRoot("properties"),
      (hasRoot("properties") && !propsOk,
        lit("$.properties: is not of type 'object'")),
      reqRoot("links"),
      (hasRoot("links") && rec.getField("links").isNull,
        lit("$.links: is not of type 'array'")),
      (hasRoot("links") && size(rec.getField("links")) < 1,
        lit("$.links: [] is too short")),
      reqProp("title"), strProp("title"),
      reqProp("description"), strProp("description"),
      reqProp("type"), strProp("type"),
      reqProp("created"), strProp("created"),
      reqProp("contacts")) ++ arrProp("contacts") ++
      Seq(reqProp("themes")) ++ arrProp("themes")

    val rootErrs = array(checks.map { case (cond, err) =>
      when(coalesce(cond, lit(false)), err)
    }: _*)

    // ---- per-item subschemas: emitted by the same facts kernel pass ----
    val itemErrs = coalesce(
      facts.getField("item_errors"), typedlit(Seq.empty[String]))

    array_compact(concat(rootErrs, itemErrs))
  }

  /** The validation test-result struct `(id, code, message, errors)` —
    * PASSED carries no message/errors, FAILED carries `'{n} error(s)'`
    * plus the errors array, exactly the reference's result dict shape
    * (`ets.py:122-146`). `errs` MUST be a materialized [[errors]]
    * attribute (kernel barrier): the struct references it four times, and
    * CollapseProject would re-inline a raw expression into each. */
  def result(errs: Column): Column = {
    val failed = size(errs) > 0
    struct(
      lit("http://wis.wmo.int/spec/wcmp/2/conf/core/validation").as("id"),
      when(failed, "FAILED").otherwise("PASSED").as("code"),
      when(failed, concat(size(errs).cast(StringType), lit(" error(s)")))
        .as("message"),
      when(failed, errs).as("errors"))
  }
}
