package graft.expressions

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JSON parse facts + schema-gate diagnostics for the WCMP2
  * engine hot path.
  *
  * ONE Jackson tokenize of `content` yields every parse artifact the
  * constraint catalog needs besides the `from_json` struct itself:
  *
  *  - `parse_ok`    — strict whole-document validity (`json.loads`
  *                    semantics, `/root/reference/pywcmp/util.py:203-219`:
  *                    one complete JSON value, nothing trailing). Unlike
  *                    a `try_parse_json` probe this also accepts duplicate
  *                    object keys (last occurrence wins), matching Python
  *                    `json.loads`.
  *  - `props_keys`  — `$.properties` member names in document order
  *                    (`json_object_keys` semantics: null when not an
  *                    object) — the missing-vs-null presence channel
  *                    `from_json` cannot provide, used by the
  *                    presence-sensitive rules (E11 data policy, K7
  *                    externalIds).
  *  - `geom_raw`    — the raw `$.geometry` value substring (null for
  *                    missing OR explicit JSON null, like `json_tuple`);
  *                    the geometry subtree is the only part of the
  *                    document that is ever re-parsed (its nesting depth
  *                    varies by geometry type, see GeoFunctions).
  *  - `gate_errors` — the COMPLETE schema-validation error array of
  *                    [[graft.catalog.SchemaGate]]: root- and
  *                    properties-level required / type / enum / minItems
  *                    constraints plus the per-item subschemas of
  *                    `links[i]` / `contacts[i]` / `themes[i]`
  *                    (`/root/reference/pywcmp/wcmp2/ets.py:116-148`),
  *                    emitted in the gate's canonical constraint order
  *                    with byte-identical messages.
  *
  * Why a kernel: profiling the compute-bound hot path showed (a) ~60% of
  * CPU in JSON re-tokenization — the same `content` string was parsed up
  * to five ways (`try_parse_json` building a whole-document variant
  * binary, `json_tuple`, `json_object_keys` x2, variant navigations) —
  * and (b) the `explode(array(struct(...)))` single-evaluation barriers
  * force INTERPRETED evaluation of every expression inside them, so the
  * gate's ~30-predicate when-array was walked by `Expression.eval` chains
  * per row. This kernel replaces all of it with one streaming pass that
  * builds no intermediate tree and allocates nothing but the key array on
  * the all-valid path (fixed diagnostics are preshared UTF8String
  * constants).
  *
  * Gate-semantics notes (parity with the previous Catalyst formulation,
  * asserted by SchemaGateSpec):
  *  - container-type errors fire for explicit JSON null AND for a
  *    mistyped value (JSON-Schema emits the same "is not of type" error
  *    for both);
  *  - `$.type: 'Feature' was expected` compares the scalar token text
  *    (numbers/booleans coerce to their literal text, like `from_json`'s
  *    string coercion; containers never equal 'Feature');
  *  - a valid-JSON non-object root reports the member-level required
  *    errors rather than jsonschema's single root type error;
  *  - a record failing to parse yields NULL facts (the gate is only read
  *    behind the engine's `parse_ok` guard).
  */
case class JsonFacts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = JsonFacts.schema
  override def checkInputDataTypes() = {
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .DataTypeMismatch(errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map("paramIndex" -> "1",
          "requiredType" -> "\"STRING\"",
          "inputSql" -> child.sql, "inputType" -> child.dataType.sql))
  }
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    JsonFacts.facts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        InternalRow ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.expressions.JsonFacts.facts(${childGen.value});
        }
        boolean ${ev.isNull} = ${ev.value} == null;
      """)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "json_facts"
}

object JsonFacts {

  val schema: StructType = StructType(Seq(
    StructField("parse_ok", BooleanType, nullable = false),
    StructField("props_keys", ArrayType(StringType, containsNull = false)),
    StructField("geom_raw", StringType),
    StructField("geo_positions",
      ArrayType(ArrayType(DoubleType, containsNull = true),
        containsNull = true)),
    StructField("gate_errors", ArrayType(StringType, containsNull = false))))

  private val factory = new JsonFactory()

  private val FAILED: InternalRow = {
    val a = new Array[Any](5)
    a(0) = java.lang.Boolean.FALSE
    new GenericInternalRow(a)
  }

  private val GeomTypes = java.util.Set.of(
    "Point", "LineString", "MultiPoint", "Polygon", "MultiLineString",
    "MultiPolygon")

  private val Core = "http://wis.wmo.int/spec/wcmp/2/conf/core"

  // fixed gate diagnostics as preshared UTF8Strings (error rows are the
  // exception; the all-valid path must not build strings)
  private def u(s: String) = UTF8String.fromString(s)
  private val RootMembers = Array(
    "id", "conformsTo", "type", "time", "geometry", "properties", "links")
  private val ReqRoot: Map[String, UTF8String] = RootMembers.map(m =>
    m -> u(s"$$: '$m' is a required property")).toMap
  private val PropMembers = Array(
    "title", "description", "type", "created", "contacts", "themes")
  private val ReqProp: Map[String, UTF8String] = PropMembers.map(m =>
    m -> u(s"$$.properties: '$m' is a required property")).toMap
  private val StrProp: Map[String, UTF8String] = PropMembers.take(4).map(m =>
    m -> u(s"$$.properties.$m: is not of type 'string'")).toMap
  private val IdNotString = u("$.id: is not of type 'string'")
  private val ConformsNotArray = u("$.conformsTo: is not of type 'array'")
  private val ConformsNoCore = u(s"$$.conformsTo: does not contain '$Core'")
  private val TypeNotFeature = u("$.type: 'Feature' was expected")
  private val TimeNotObj = u("$.time: is not of type 'object', 'null'")
  private val GeomNotObj = u("$.geometry: is not of type 'object', 'null'")
  private val PropsNotObj = u("$.properties: is not of type 'object'")
  private val LinksNotArray = u("$.links: is not of type 'array'")
  private val LinksTooShort = u("$.links: [] is too short")
  private val ContactsNotArray =
    u("$.properties.contacts: is not of type 'array'")
  private val ContactsTooShort = u("$.properties.contacts: [] is too short")
  private val ThemesNotArray = u("$.properties.themes: is not of type 'array'")
  private val ThemesTooShort = u("$.properties.themes: [] is too short")

  private def add(out: ArrayBuffer[Any], s: String): Unit =
    out += UTF8String.fromString(s)

  /** Skip the value whose first token is `t` (containers consume through
    * their matching end token; scalars are already consumed). */
  private def skipValue(p: JsonParser, t: JsonToken): Unit =
    if (t == JsonToken.START_OBJECT || t == JsonToken.START_ARRAY)
      p.skipChildren()

  /** Raw value substring by token char offsets; SQL NULL for JSON null
    * (the `json_tuple` convention its consumers rely on). */
  private def rawValue(p: JsonParser, s: String, t: JsonToken): UTF8String = {
    if (t == JsonToken.VALUE_NULL) { return null }
    val start = p.currentTokenLocation().getCharOffset.toInt
    skipValue(p, t)
    val end = p.currentLocation().getCharOffset.toInt
    if (start < 0 || end <= start || end > s.length) null
    else UTF8String.fromString(s.substring(start, end))
  }

  /** member states: 0 missing, 1 expected type, 2 present-but-mistyped
    * (JSON null counts as mistyped — JSON-Schema's "is not of type"). */
  private final class Walk {
    var idState = 0
    var confState = 0; var confHasCore = false
    var typeState = 0; var typeText: String = null
    var timeState = 0 // 0 missing, 1 object, 2 mistyped, 3 JSON null
    var geomState = 0
    var geomRaw: UTF8String = null
    var geomType: String = null
    var geomPositions: ArrayBuffer[Any] = null
    var propsState = 0
    var propsKeys: ArrayBuffer[Any] = null
    var linksState = 0; var linksCount = 0
    var linksErrs: ArrayBuffer[Any] = null
    var titleState = 0; var descState = 0
    var ptypeState = 0; var createdState = 0
    var contactsState = 0; var contactsCount = 0
    var contactsErrs: ArrayBuffer[Any] = null
    var themesState = 0; var themesCount = 0
    var themesErrs: ArrayBuffer[Any] = null
  }

  private def strState(t: JsonToken): Int =
    if (t == JsonToken.VALUE_STRING) 1 else 2

  /** `links[i]`: object with required string `href` and `rel`. */
  private def walkLinks(p: JsonParser, w: Walk): Unit = {
    val out = new ArrayBuffer[Any](0)
    w.linksErrs = out
    var i = 0
    var e = p.nextToken()
    while (e != JsonToken.END_ARRAY) {
      val pfx = s"$$.links[$i]"
      if (e != JsonToken.START_OBJECT) {
        add(out, s"$pfx: is not of type 'object'"); skipValue(p, e)
      } else {
        var href = 0; var rel = 0
        var fn = p.nextFieldName()
        while (fn != null) {
          val ft = p.nextToken()
          fn match {
            case "href" => href = strState(ft)
            case "rel"  => rel = strState(ft)
            case _ =>
          }
          skipValue(p, ft)
          fn = p.nextFieldName()
        }
        if (href == 0) add(out, s"$pfx: 'href' is a required property")
        else if (href == 2) add(out, s"$pfx.href: is not of type 'string'")
        if (rel == 0) add(out, s"$pfx: 'rel' is a required property")
        else if (rel == 2) add(out, s"$pfx.rel: is not of type 'string'")
      }
      i += 1
      e = p.nextToken()
    }
    w.linksCount = i
  }

  /** `contacts[i]`: object; `roles` required array; anyOf
    * name/organization. */
  private def walkContacts(p: JsonParser, w: Walk): Unit = {
    val out = new ArrayBuffer[Any](0)
    w.contactsErrs = out
    var i = 0
    var e = p.nextToken()
    while (e != JsonToken.END_ARRAY) {
      val pfx = s"$$.properties.contacts[$i]"
      if (e != JsonToken.START_OBJECT) {
        add(out, s"$pfx: is not of type 'object'"); skipValue(p, e)
      } else {
        var roles = 0
        var hasName = false; var hasOrg = false
        var fn = p.nextFieldName()
        while (fn != null) {
          val ft = p.nextToken()
          fn match {
            case "roles" => roles = if (ft == JsonToken.START_ARRAY) 1 else 2
            case "name" => hasName = true
            case "organization" => hasOrg = true
            case _ =>
          }
          skipValue(p, ft)
          fn = p.nextFieldName()
        }
        if (roles == 0) add(out, s"$pfx: 'roles' is a required property")
        else if (roles == 2) add(out, s"$pfx.roles: is not of type 'array'")
        if (!hasName && !hasOrg)
          add(out, s"$pfx: is not valid under any of the given schemas")
      }
      i += 1
      e = p.nextToken()
    }
    w.contactsCount = i
  }

  /** `themes[i]`: object; `concepts` required array minItems 1; `scheme`
    * required string; `concepts[j]` object with required string `id`.
    * Canonical emit order per theme (concepts-level, scheme, concept
    * items) regardless of member order in the document. */
  private def walkThemes(p: JsonParser, w: Walk): Unit = {
    val out = new ArrayBuffer[Any](0)
    w.themesErrs = out
    var i = 0
    var e = p.nextToken()
    while (e != JsonToken.END_ARRAY) {
      val pfx = s"$$.properties.themes[$i]"
      if (e != JsonToken.START_OBJECT) {
        add(out, s"$pfx: is not of type 'object'"); skipValue(p, e)
      } else {
        var concepts = 0
        var conceptCount = 0
        var scheme = 0
        var conceptErrs: ArrayBuffer[Any] = null
        var fn = p.nextFieldName()
        while (fn != null) {
          val ft = p.nextToken()
          fn match {
            case "concepts" =>
              if (ft != JsonToken.START_ARRAY) { concepts = 2; skipValue(p, ft) }
              else {
                concepts = 1
                conceptErrs = new ArrayBuffer[Any](0)
                conceptCount = 0
                var c = p.nextToken()
                while (c != JsonToken.END_ARRAY) {
                  val cp = s"$pfx.concepts[$conceptCount]"
                  if (c != JsonToken.START_OBJECT) {
                    add(conceptErrs, s"$cp: is not of type 'object'")
                    skipValue(p, c)
                  } else {
                    var id = 0
                    var cf = p.nextFieldName()
                    while (cf != null) {
                      val ct = p.nextToken()
                      if (cf == "id") id = strState(ct)
                      skipValue(p, ct)
                      cf = p.nextFieldName()
                    }
                    if (id == 0)
                      add(conceptErrs, s"$cp: 'id' is a required property")
                    else if (id == 2)
                      add(conceptErrs, s"$cp.id: is not of type 'string'")
                  }
                  conceptCount += 1
                  c = p.nextToken()
                }
              }
            case "scheme" =>
              scheme = strState(ft)
              skipValue(p, ft)
            case _ => skipValue(p, ft)
          }
          fn = p.nextFieldName()
        }
        if (concepts == 0) add(out, s"$pfx: 'concepts' is a required property")
        else if (concepts == 2) add(out, s"$pfx.concepts: is not of type 'array'")
        else if (conceptCount < 1) add(out, s"$pfx.concepts: [] is too short")
        if (scheme == 0) add(out, s"$pfx: 'scheme' is a required property")
        else if (scheme == 2) add(out, s"$pfx.scheme: is not of type 'string'")
        if (conceptErrs != null) out ++= conceptErrs
      }
      i += 1
      e = p.nextToken()
    }
    w.themesCount = i
  }

  /** `$.geometry` object walk: type + the flattened position list
    * (shapely-equivalent: every innermost numeric array of `coordinates`
    * is one position, in document order — Point/LineString/MultiPoint/
    * Polygon/MultiLineString/MultiPolygon all flatten to this; an
    * unrecognized `type` yields null positions like the declarative
    * per-type CaseWhen in GeoFunctions). Pathological depth-mismatched
    * coordinates yield the best-effort position list rather than the
    * declarative version's partial-null artifacts (outcome-equal for the
    * E4 bounds check). */
  private def walkGeometry(p: JsonParser, w: Walk): Unit = {
    w.geomType = null; w.geomPositions = null
    var coords: ArrayBuffer[Any] = null
    var fn = p.nextFieldName()
    while (fn != null) {
      val ft = p.nextToken()
      fn match {
        case "type" =>
          w.geomType = if (ft == JsonToken.VALUE_STRING) p.getText else null
          skipValue(p, ft)
        case "coordinates" =>
          if (ft != JsonToken.START_ARRAY) { coords = null; skipValue(p, ft) }
          else { coords = new ArrayBuffer[Any](8); collectPositions(p, coords) }
        case _ => skipValue(p, ft)
      }
      fn = p.nextFieldName()
    }
    if (w.geomType != null && GeomTypes.contains(w.geomType) && coords != null)
      w.geomPositions = coords
  }

  /** Inside an open array: recurse into nested arrays; a maximal array of
    * scalars is one position (non-numeric scalars become null ordinates).
    * A scalar directly inside a non-innermost array context (e.g. Point
    * coordinates: the open array IS the position) is handled by treating
    * any array whose first element is a scalar as a position. */
  private def collectPositions(p: JsonParser, out: ArrayBuffer[Any]): Unit = {
    var t = p.nextToken()
    if (t == JsonToken.END_ARRAY) return
    if (t != JsonToken.START_ARRAY) {
      // this array is itself a position
      val pos = new ArrayBuffer[Any](4)
      while (t != JsonToken.END_ARRAY) {
        if (t == JsonToken.VALUE_NUMBER_INT ||
            t == JsonToken.VALUE_NUMBER_FLOAT)
          pos += java.lang.Double.valueOf(p.getDoubleValue)
        else { pos += null; skipValue(p, t) }
        t = p.nextToken()
      }
      out += new GenericArrayData(pos.toArray)
    } else {
      while (t != JsonToken.END_ARRAY) {
        if (t == JsonToken.START_ARRAY) collectPositions(p, out)
        else skipValue(p, t)
        t = p.nextToken()
      }
    }
  }

  /** `$.properties` object walk: key list, string-type tags for the four
    * string members, contacts/themes item subschemas. */
  private def walkProps(p: JsonParser, w: Walk): Unit = {
    // duplicate-key last-wins: a re-encountered $.properties object fully
    // replaces the first one's member states
    w.propsKeys = new ArrayBuffer[Any]
    w.titleState = 0; w.descState = 0; w.ptypeState = 0; w.createdState = 0
    w.contactsState = 0; w.contactsCount = 0; w.contactsErrs = null
    w.themesState = 0; w.themesCount = 0; w.themesErrs = null
    var pf = p.nextFieldName()
    while (pf != null) {
      add(w.propsKeys, pf)
      val pt = p.nextToken()
      pf match {
        case "title" => w.titleState = strState(pt); skipValue(p, pt)
        case "description" => w.descState = strState(pt); skipValue(p, pt)
        case "type" => w.ptypeState = strState(pt); skipValue(p, pt)
        case "created" => w.createdState = strState(pt); skipValue(p, pt)
        case "contacts" =>
          if (pt != JsonToken.START_ARRAY) {
            w.contactsState = 2; w.contactsErrs = null; skipValue(p, pt)
          } else { w.contactsState = 1; walkContacts(p, w) }
        case "themes" =>
          if (pt != JsonToken.START_ARRAY) {
            w.themesState = 2; w.themesErrs = null; skipValue(p, pt)
          } else { w.themesState = 1; walkThemes(p, w) }
        case _ => skipValue(p, pt)
      }
      pf = p.nextFieldName()
    }
  }

  /** The gate's error array in canonical constraint order (the order of
    * the previous Catalyst `checks` Seq, then links / contacts / themes
    * item diagnostics). */
  private def gateErrors(w: Walk): GenericArrayData = {
    val out = new ArrayBuffer[Any](0)
    // root-level members
    if (w.idState == 0) out += ReqRoot("id")
    else if (w.idState == 2) out += IdNotString
    if (w.confState == 0) out += ReqRoot("conformsTo")
    else if (w.confState == 2) out += ConformsNotArray
    else if (!w.confHasCore) out += ConformsNoCore
    if (w.typeState == 0) out += ReqRoot("type")
    else if (w.typeText == null || w.typeText != "Feature")
      out += TypeNotFeature
    if (w.timeState == 0) out += ReqRoot("time")
    else if (w.timeState == 2) out += TimeNotObj
    if (w.geomState == 0) out += ReqRoot("geometry")
    else if (w.geomState == 2) out += GeomNotObj
    if (w.propsState == 0) out += ReqRoot("properties")
    else if (w.propsState == 2) out += PropsNotObj
    if (w.linksState == 0) out += ReqRoot("links")
    else if (w.linksState == 2) out += LinksNotArray
    else if (w.linksCount < 1) out += LinksTooShort
    // properties-level members (only when $.properties is an object)
    if (w.propsState == 1) {
      if (w.titleState == 0) out += ReqProp("title")
      else if (w.titleState == 2) out += StrProp("title")
      if (w.descState == 0) out += ReqProp("description")
      else if (w.descState == 2) out += StrProp("description")
      if (w.ptypeState == 0) out += ReqProp("type")
      else if (w.ptypeState == 2) out += StrProp("type")
      if (w.createdState == 0) out += ReqProp("created")
      else if (w.createdState == 2) out += StrProp("created")
      if (w.contactsState == 0) out += ReqProp("contacts")
      else if (w.contactsState == 2) out += ContactsNotArray
      else if (w.contactsCount < 1) out += ContactsTooShort
      if (w.themesState == 0) out += ReqProp("themes")
      else if (w.themesState == 2) out += ThemesNotArray
      else if (w.themesCount < 1) out += ThemesTooShort
    }
    // per-item subschema diagnostics
    if (w.linksErrs != null) out ++= w.linksErrs
    if (w.contactsErrs != null) out ++= w.contactsErrs
    if (w.themesErrs != null) out ++= w.themesErrs
    new GenericArrayData(out.toArray)
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def facts(content: UTF8String): InternalRow = {
    val s = content.toString
    val w = new Walk
    try {
      val p = factory.createParser(s)
      try {
        val t0 = p.nextToken()
        if (t0 == null) return FAILED
        if (t0 == JsonToken.START_OBJECT) {
          var fn = p.nextFieldName()
          while (fn != null) {
            val vt = p.nextToken()
            fn match {
              case "id" => w.idState = strState(vt); skipValue(p, vt)
              case "conformsTo" =>
                if (vt != JsonToken.START_ARRAY) {
                  w.confState = 2; w.confHasCore = false; skipValue(p, vt)
                } else {
                  w.confState = 1; w.confHasCore = false
                  var e = p.nextToken()
                  while (e != JsonToken.END_ARRAY) {
                    if (e == JsonToken.VALUE_STRING && p.getText == Core)
                      w.confHasCore = true
                    skipValue(p, e)
                    e = p.nextToken()
                  }
                }
              case "type" =>
                if (vt == JsonToken.START_OBJECT || vt == JsonToken.START_ARRAY
                    || vt == JsonToken.VALUE_NULL) {
                  w.typeState = 2; w.typeText = null; skipValue(p, vt)
                } else { w.typeState = 1; w.typeText = p.getText }
              case "time" =>
                w.timeState =
                  if (vt == JsonToken.START_OBJECT) 1
                  else if (vt == JsonToken.VALUE_NULL) 3 else 2
                skipValue(p, vt)
              case "geometry" =>
                w.geomState =
                  if (vt == JsonToken.START_OBJECT) 1
                  else if (vt == JsonToken.VALUE_NULL) 3 else 2
                if (vt != JsonToken.START_OBJECT) {
                  w.geomType = null; w.geomPositions = null
                  w.geomRaw = rawValue(p, s, vt)
                }
                else {
                  val start = p.currentTokenLocation().getCharOffset.toInt
                  walkGeometry(p, w)
                  val end = p.currentLocation().getCharOffset.toInt
                  w.geomRaw =
                    if (start < 0 || end <= start || end > s.length) null
                    else UTF8String.fromString(s.substring(start, end))
                }
              case "properties" =>
                if (vt != JsonToken.START_OBJECT) {
                  w.propsState = 2; w.propsKeys = null; skipValue(p, vt)
                } else { w.propsState = 1; walkProps(p, w) }
              case "links" =>
                if (vt != JsonToken.START_ARRAY) {
                  w.linksState = 2; w.linksErrs = null; skipValue(p, vt)
                } else { w.linksState = 1; walkLinks(p, w) }
              case _ => skipValue(p, vt)
            }
            fn = p.nextFieldName()
          }
        } else {
          skipValue(p, t0)
        }
        // json.loads strictness: exactly one value, nothing trailing
        if (p.nextToken() != null) return FAILED
      } finally p.close()
    } catch {
      case scala.util.control.NonFatal(_) => return FAILED
    }
    val a = new Array[Any](5)
    a(0) = java.lang.Boolean.TRUE
    a(1) =
      if (w.propsKeys == null) null
      else new GenericArrayData(w.propsKeys.toArray)
    a(2) = w.geomRaw
    a(3) =
      if (w.geomPositions == null) null
      else new GenericArrayData(w.geomPositions.toArray)
    a(4) = gateErrors(w)
    new GenericInternalRow(a)
  }

  def jsonFacts(c: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(JsonFacts(shims.expression(c)))
  }
}
