package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** Per-item WCMP2 subschema errors over the record VARIANT — one native
  * kernel walk of the binary variant instead of interpreted higher-order
  * functions.
  *
  * Covers the item-level constraints of `links[i]` (object; href/rel
  * required string), `properties.contacts[i]` (object; roles required
  * array; anyOf name/organization) and `properties.themes[i]` (object;
  * concepts required array minItems 1; scheme required string;
  * `concepts[j]` object with required string id) — the checks the
  * reference's `iter_errors` reports item-by-item
  * (`/root/reference/pywcmp/wcmp2/ets.py:128-148` over the bundled
  * schema). Error strings are byte-identical to the previous Catalyst
  * formulation (asserted by SchemaGateSpec).
  *
  * Why native: the declarative version was three `array<variant>` slices
  * each walked by interpreted `transform` lambdas doing ~10 variant
  * navigations per item (lambda argument subtrees re-evaluate per
  * reference) — measured ~30% of whole-engine throughput at
  * compute-bound thread counts. Here each row costs ONE static call that
  * navigates the variant bytes directly (`Variant.getFieldByKey` is a
  * dictionary-id binary search, no string materialization), and the
  * common all-valid case allocates nothing but the empty result.
  *
  * Semantics channel parity with the slice formulation: a MISSING member
  * -> `getFieldByKey` null (required error); an explicit JSON null ->
  * `Type.NULL` variant (type error) — same missing-vs-null distinction
  * `try_variant_get(..., 'variant')` provided.
  */
case class Wcmp2ItemErrors(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType.isInstanceOf[VariantType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .DataTypeMismatch(errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map("paramIndex" -> "1",
          "requiredType" -> "\"VARIANT\"",
          "inputSql" -> child.sql, "inputType" -> child.dataType.sql))
  }
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Wcmp2ItemErrors.itemErrors(input.asInstanceOf[VariantVal])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} =
            graft.expressions.Wcmp2ItemErrors.itemErrors(${childGen.value});
        }
        boolean ${ev.isNull} = ${ev.value} == null;
      """)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "wcmp2_item_errors"
}

object Wcmp2ItemErrors {
  private val T_OBJECT = VariantUtil.Type.OBJECT
  private val T_ARRAY = VariantUtil.Type.ARRAY
  private val T_STRING = VariantUtil.Type.STRING

  private def add(out: ArrayBuffer[Any], s: String): Unit =
    out += UTF8String.fromString(s)

  /** required-string member check shared by links.href/rel, themes.scheme
    * and concepts.id */
  private def reqString(out: ArrayBuffer[Any], e: Variant, member: String,
                        p: String): Unit = {
    val f = e.getFieldByKey(member)
    if (f == null) add(out, s"$p: '$member' is a required property")
    else if (f.getType != T_STRING)
      add(out, s"$p.$member: is not of type 'string'")
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def itemErrors(v: VariantVal): ArrayData = {
    val out = new ArrayBuffer[Any](0)
    val root = new Variant(v.getValue, v.getMetadata)
    if (root.getType == T_OBJECT) {
      val links = root.getFieldByKey("links")
      if (links != null && links.getType == T_ARRAY) {
        val n = links.arraySize()
        var i = 0
        while (i < n) {
          val e = links.getElementAtIndex(i)
          val p = s"$$.links[$i]"
          if (e.getType != T_OBJECT) add(out, s"$p: is not of type 'object'")
          else {
            reqString(out, e, "href", p)
            reqString(out, e, "rel", p)
          }
          i += 1
        }
      }
      val props = root.getFieldByKey("properties")
      if (props != null && props.getType == T_OBJECT) {
        val contacts = props.getFieldByKey("contacts")
        if (contacts != null && contacts.getType == T_ARRAY) {
          val n = contacts.arraySize()
          var i = 0
          while (i < n) {
            val e = contacts.getElementAtIndex(i)
            val p = s"$$.properties.contacts[$i]"
            if (e.getType != T_OBJECT) add(out, s"$p: is not of type 'object'")
            else {
              val roles = e.getFieldByKey("roles")
              if (roles == null) add(out, s"$p: 'roles' is a required property")
              else if (roles.getType != T_ARRAY)
                add(out, s"$p.roles: is not of type 'array'")
              if (e.getFieldByKey("name") == null &&
                  e.getFieldByKey("organization") == null)
                add(out, s"$p: is not valid under any of the given schemas")
            }
            i += 1
          }
        }
        val themes = props.getFieldByKey("themes")
        if (themes != null && themes.getType == T_ARRAY) {
          val n = themes.arraySize()
          var i = 0
          while (i < n) {
            val e = themes.getElementAtIndex(i)
            val p = s"$$.properties.themes[$i]"
            if (e.getType != T_OBJECT) add(out, s"$p: is not of type 'object'")
            else {
              val concepts = e.getFieldByKey("concepts")
              if (concepts == null)
                add(out, s"$p: 'concepts' is a required property")
              else if (concepts.getType != T_ARRAY)
                add(out, s"$p.concepts: is not of type 'array'")
              else if (concepts.arraySize() < 1)
                add(out, s"$p.concepts: [] is too short")
              reqString(out, e, "scheme", p)
              if (concepts != null && concepts.getType == T_ARRAY) {
                val m = concepts.arraySize()
                var j = 0
                while (j < m) {
                  val c = concepts.getElementAtIndex(j)
                  val cp = s"$p.concepts[$j]"
                  if (c.getType != T_OBJECT)
                    add(out, s"$cp: is not of type 'object'")
                  else reqString(out, c, "id", cp)
                  j += 1
                }
              }
            }
            i += 1
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  def wcmp2ItemErrors(c: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(Wcmp2ItemErrors(shims.expression(c)))
  }
}
