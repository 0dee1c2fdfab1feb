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
  * evaluated during the engine's single-tokenize parse pass
  * ([[graft.expressions.JsonFacts]]), which emits the complete gate error
  * array alongside the other parse artifacts — the gate adds ZERO extra
  * scans of the document text and zero interpreted per-check expression
  * evaluation. (History, measured at compute-bound thread counts: naive
  * per-check `variant_get` formulations cost 40-45% of engine
  * throughput; a compiled Catalyst when-array over shared parse
  * artifacts held the gate to ~15% but still re-tokenized the document
  * several ways AND ran interpreted inside the single-evaluation
  * Generate barrier; the in-kernel walk makes the gate effectively
  * free.) The kernel preserves the compiled formulation's channels:
  * missing-vs-null member presence, container types with JSON-Schema's
  * "is not of type" for explicit null, first-token object-ness for the
  * nullable `time`/`geometry`, and true JSON string types for the five
  * string-typed members that Hive-style JSON functions and lenient
  * `from_json` both erase.
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
  * Draft 2020-12 keyword classes beyond required/type/enum/minItems:
  *
  *  - `pattern` — the `id` URN prefix `^urn:wmo:md:` (the WCMP2
  *    identifier syntax requirement). Deliberately prefix-only: the
  *    reference's own expectations prove the bundled schema ACCEPTS
  *    records whose local identifier is empty or contains spaces — those
  *    fixtures fail only the ETS identifier test
  *    (`/root/reference/tests/run_tests.py:148-181`), so any stricter
  *    schema-level pattern would diverge from `iter_errors`.
  *  - `uniqueItems` — `conformsTo` (duplicate conformance-class
  *    declarations), compared over coerced string leaves: scalars as
  *    text, containers by minified JSON (identical objects compare
  *    equal); JSON nulls are excluded (both engines erase them to SQL
  *    NULL — documented approximation vs jsonschema's null==null).
  *  - `format` — deliberately NOT enforced, and that IS the parity: in
  *    Draft 2020-12 `format` is an annotation, not an assertion, unless a
  *    format checker is supplied, and the reference constructs
  *    `Draft202012Validator(json.load(fh))` with no `format_checker`
  *    (`ets.py:137`) — so a malformed `links[i].href` URI raises no
  *    schema error in pywcmp either (SchemaGateSpec asserts this
  *    non-enforcement).
  *  - `additionalProperties` and any further constraints of the
  *    runtime-fetched `wcmp2-bundled.json` (the schema is downloaded by
  *    `bundle.py:54-112` and is not shipped in the reference repo, so it
  *    cannot be consulted in this zero-egress environment) remain the
  *    documented residue.
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

  /** All schema errors for one record as `array<string>`, in the
    * canonical order of the compiled constraints (root-level members,
    * properties-level members, per-item subschemas).
    *
    * The entire constraint walk — presence, container types, minItems,
    * string types, the `Feature` const, the conformsTo core containment,
    * and the per-item diagnostics — is emitted by the single-tokenize
    * [[graft.expressions.JsonFacts]] kernel pass; this accessor only
    * restores the empty-array convention for unparseable records (the
    * kernel yields NULL facts there, and the gate is read strictly behind
    * the engine's `parse_ok` guard).
    *
    * @param facts [[graft.expressions.JsonFacts]] struct attribute
    */
  def errors(facts: Column): Column =
    coalesce(facts.getField("gate_errors"), typedlit(Seq.empty[String]))

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
