package graft.expressions

import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the two per-row text pipelines the KPI catalog
  * references many times each — previously interpreted HOF chains inside
  * the single-evaluation Generate barrier (regexp_extract_all + per-token
  * rlike + 7k-word set membership for the spellcheck; regex strip/split
  * chains for the title words), together a measurable slice of hot-path
  * CPU. Each kernel is one static JVM call with precompiled patterns and
  * a prebuilt hash set; semantics are IDENTICAL to the declarative
  * formulations in [[graft.functions.Wcmp2Functions]] (kept as the
  * documented reference implementation and the [[graft.catalog.RecordCols]]
  * fallback), asserted token-for-token by FunctionsSpec parity tests.
  */
object TextKernels {

  /** pyspellchecker `split_words` tokenizer (`/root/reference/pywcmp/
    * util.py:45-59` via `SpellChecker.unknown`): `\w[\w']*\w|\w` Unicode,
    * over the lowercased text. */
  private val tokenRe = Pattern.compile("(?U)\\w[\\w']*\\w|\\w")

  /** float-parseable per Python `float()` — such tokens are never
    * spell-checked (pyspellchecker `_check_if_should_check`). Shares the
    * declarative impl's pattern (Python grammar: underscores only between
    * digits; inf/infinity/nan literals). */
  private val floatRe =
    Pattern.compile(graft.functions.Wcmp2Functions.floatLike)

  private lazy val dictionary: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](16384)
    graft.dims.Dims.dictionary.foreach(s.add)
    s
  }

  /** `SpellChecker.unknown(split_words(text))` preserving encounter order
    * and duplicates — the token list the declarative
    * `filter(spellTokens(text), ...)` chain produces. */
  def misspelledTokens(text: UTF8String): GenericArrayData = {
    // Lower.eval == UTF8String.toLowerCase (ASCII fast path, JVM
    // default-locale lowering otherwise) — match it exactly
    val lowered = text.toLowerCase.toString
    val m = tokenRe.matcher(lowered)
    val out = new ArrayBuffer[Any](0)
    while (m.find()) {
      val tok = m.group(0)
      if (!floatRe.matcher(tok).find() && !dictionary.contains(tok))
        out += UTF8String.fromString(tok)
    }
    new GenericArrayData(out.toArray)
  }

  private val acronymRe = Pattern.compile("\\b([A-Z]{2,}\\d*)\\b")
  private val leadWs = Pattern.compile("^\\s+")
  private val trailWs = Pattern.compile("\\s+$")
  private val wsRun = Pattern.compile("\\s+")

  private def pyStrip(s: String): String =
    trailWs.matcher(leadWs.matcher(s).replaceAll("")).replaceAll("")

  /** struct(words, stripped) for the K1 title checks: `title.split()`
    * (Python no-arg split: strip, split on whitespace runs, no empties)
    * and the acronym-stripped title
    * (`pyStrip(regexp_replace(title, acronymRe, ""))`). */
  def titleWords(title: UTF8String): InternalRow = {
    val s = title.toString
    val stripped0 = pyStrip(s)
    val words: Array[Any] =
      if (stripped0.isEmpty) Array.empty
      else wsRun.split(stripped0).filter(_.nonEmpty)
        .map(w => UTF8String.fromString(w)).toArray[Any]
    val strippedAcr = pyStrip(acronymRe.matcher(s).replaceAll(""))
    val a = new Array[Any](2)
    a(0) = new GenericArrayData(words)
    a(1) = UTF8String.fromString(strippedAcr)
    new GenericInternalRow(a)
  }
}

/** `array<string>` of misspelled tokens — see [[TextKernels]]. */
case class Misspelled(child: Expression) extends StringInputExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    TextKernels.misspelledTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextKernels.misspelledTokens($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "misspelled_tokens"
}

/** struct(words array<string>, stripped string) — see [[TextKernels]]. */
case class TitleWords(child: Expression) extends StringInputExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("words", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("stripped", StringType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    TextKernels.titleWords(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TextKernels.titleWords($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "title_words"
}

object Misspelled {
  def misspelled(c: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(Misspelled(shims.expression(c)))
  }
}

object TitleWords {
  def titleWords(c: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(TitleWords(shims.expression(c)))
  }
}
