package graft.expressions

import java.nio.charset.StandardCharsets.UTF_8
import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Merges-based byte-level BPE tokenizer as native codegen'd expressions —
  * the real subword tokenizer behind token counting and token-budget
  * curation (replacing the round-4 regex pretokenizer approximation,
  * which survives as `TextAnalysis.tokenCountPretok`).
  *
  * Algorithm and table format follow the PUBLIC byte-level BPE design
  * (Sennrich et al. 2016 "Neural Machine Translation of Rare Words with
  * Subword Units"; byte-level variant per the openai/gpt-2 reference
  * encoder, MIT-licensed public code):
  *
  *   1. pretokenize with the GPT-2 pattern family
  *      (`'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|
  *      \s+(?!\S)|\s+`, Java-regex `\s` semantics);
  *   2. map each pretoken's UTF-8 bytes through the GPT-2 byte<->unicode
  *      bijection (printable latin-1 bytes map to themselves, the other
  *      68 bytes to U+0100+n in byte order) so every merge table entry is
  *      printable text;
  *   3. repeatedly find the LOWEST-RANK adjacent symbol pair present in
  *      the word and merge ALL its non-overlapping occurrences
  *      left-to-right, until no adjacent pair has a rank.
  *
  * The merges table ships at `src/main/resources/bpe/merges.txt` in the
  * standard `merges.txt` line format (`left right` per line, rank = line
  * order, `#`-prefixed header skipped) — any published GPT-2-family
  * merges file drops in unchanged. The vendored table is trained
  * DETERMINISTICALLY by [[graft.tools.TrainBpe]] over the driver's
  * synthetic corpus + the WCMP2 fixture records (zero-egress sandbox: no
  * published table can be downloaded, so the repo carries a reproducible
  * one; regenerate with `runMain graft.tools.TrainBpe`).
  *
  * Token ids: 0..255 are the base byte symbols, 256+i is the result of
  * merge line i. Byte-level BPE is lossless: `decode(encode(s)) == s`
  * for any string (asserted in BpeSpec).
  *
  * Cross-checked two ways: [[graft.tools.BpeReference]] is a structurally
  * independent list-of-strings implementation of the same public spec
  * (its per-doc counts are dumped to parquet and DuckDB-compared against
  * this kernel's counts in the `q_token_bpe` driver oracle), and BpeSpec
  * pins hand-derived golden splits on a tiny explicit merge table.
  */
object Bpe {

  /** GPT-2 pretokenizer pattern (public reference encoder). */
  val pretokenPattern: Pattern = Pattern.compile(
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+")

  /** byte value -> printable char: identity for '!'..'~', U+00A1..U+00AC,
    * U+00AE..U+00FF; the remaining 68 byte values map to U+0100, U+0101,
    * ... in ascending byte order (the GPT-2 bijection). */
  val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val direct = (b >= '!' && b <= '~') || (b >= 0xA1 && b <= 0xAC) ||
        (b >= 0xAE && b <= 0xFF)
      if (direct) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** inverse of [[byteToChar]] */
  val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** parse merges.txt lines: `#`-prefixed and blank lines skipped; each
    * remaining line is `left<space>right` over the byte-unicode
    * alphabet. */
  def parseMerges(lines: Iterator[String]): Seq[(String, String)] =
    lines.map(_.stripLineEnd)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.lastIndexOf(' ')
        require(sp > 0 && sp < l.length - 1, s"malformed merge line: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toSeq

  /** the vendored default codec (resource `/bpe/merges.txt`) */
  lazy val default: BpeCodec = {
    val in = getClass.getResourceAsStream("/bpe/merges.txt")
    require(in != null, "missing resource /bpe/merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try new BpeCodec(parseMerges(src.getLines())) finally src.close()
  }

  // ---- static kernels shared by interpreted eval and generated code ----

  def count(text: UTF8String): Int = default.count(text.toString)

  def ids(text: UTF8String): GenericArrayData =
    new GenericArrayData(default.encode(text.toString))

  // ---- Column API ----

  /** exact subword token count under the vendored merges table */
  def bpeTokenCount(text: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(BpeTokenCount(shims.expression(text)))
  }

  /** token-id array (0..255 bytes, 256+i merge results) */
  def bpeTokenIds(text: Column): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(BpeTokenIds(shims.expression(text)))
  }
}

/** A loaded BPE merge table + the encode/decode/count kernels. Thread-safe;
  * one instance per table (the resource-backed default is
  * [[Bpe.default]]). */
final class BpeCodec(merges: Seq[(String, String)]) {
  require(merges.length <= (Int.MaxValue >> 1) - 256, "merge table too large")

  // symbol interning: ids 0..255 are the single mapped byte chars, id
  // 256+i is the string produced by merge i. Lookup maps are built once.
  private val symbolStrings = new ArrayBuffer[String](256 + merges.length)
  (0 until 256).foreach(b => symbolStrings += Bpe.byteToChar(b).toString)
  private val idOfSymbol = new java.util.HashMap[String, Integer](1024)
  symbolStrings.zipWithIndex.foreach { case (s, i) =>
    idOfSymbol.put(s, i)
  }
  // (leftId << 32 | rightId) -> merged symbol id; rank == mergedId - 256,
  // so "lowest rank" == "smallest merged id" — one map serves both.
  private val mergeTo = new java.util.HashMap[java.lang.Long, Integer](
    merges.length * 2)
  merges.zipWithIndex.foreach { case ((a, b), i) =>
    val ai = idOfSymbol.get(a); val bi = idOfSymbol.get(b)
    require(ai != null && bi != null,
      s"merge $i ('$a','$b') references unknown symbol — merges must be " +
        "topologically ordered (every side is a byte or an earlier merge)")
    val merged = a + b
    val id = 256 + i
    symbolStrings += merged
    // a merged string can collide with an earlier symbol only in a
    // degenerate table; first definition wins for encoding
    if (!idOfSymbol.containsKey(merged)) idOfSymbol.put(merged, id)
    mergeTo.put((ai.longValue() << 32) | bi.longValue(), id)
  }

  def vocabSize: Int = symbolStrings.length

  /** pretoken string -> token ids, memoized (corpora repeat pretokens
    * heavily; the cache is bounded — beyond the cap entries are computed
    * but not inserted, results are identical either way). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]](1 << 12)
  private val CacheCap = 1 << 16

  private[expressions] def encodePretoken(tok: String): Array[Int] = {
    val hit = cache.get(tok)
    if (hit != null) return hit
    val bytes = tok.getBytes(UTF_8)
    var ids = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { ids(i) = bytes(i) & 0xFF; i += 1 }
    var n = ids.length
    // merge loop: find the smallest merged-id (== lowest-rank) adjacent
    // pair, merge all its occurrences left-to-right, repeat
    while (n > 1) {
      var best = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val m = mergeTo.get((ids(j).toLong << 32) | ids(j + 1).toLong)
        if (m != null && m.intValue() < best) best = m.intValue()
        j += 1
      }
      if (best == Int.MaxValue) n = -n // no pair mergeable: exit
      else {
        val (a, b) = {
          val pair = merges(best - 256)
          (idOfSymbol.get(pair._1).intValue(), idOfSymbol.get(pair._2).intValue())
        }
        var w = 0; var r = 0
        while (r < n) {
          if (r < n - 1 && ids(r) == a && ids(r + 1) == b) {
            ids(w) = best; r += 2
          } else { ids(w) = ids(r); r += 1 }
          w += 1
        }
        n = w
      }
    }
    if (n < 0) n = -n
    val out = if (n == ids.length) ids else java.util.Arrays.copyOf(ids, n)
    if (cache.size < CacheCap) cache.put(tok, out)
    out
  }

  /** full text -> token ids */
  def encode(text: String): Array[Int] = {
    val m = Bpe.pretokenPattern.matcher(text)
    val out = new ArrayBuffer[Int](text.length / 3 + 4)
    while (m.find()) out ++= encodePretoken(m.group())
    out.toArray
  }

  /** exact token count (same walk as [[encode]] without materializing) */
  def count(text: String): Int = {
    val m = Bpe.pretokenPattern.matcher(text)
    var n = 0
    while (m.find()) n += encodePretoken(m.group()).length
    n
  }

  /** lossless inverse of [[encode]] */
  def decode(ids: Array[Int]): String = {
    val sb = new java.lang.StringBuilder()
    ids.foreach(id => sb.append(symbolStrings(id)))
    val chars = sb.toString
    val bytes = new Array[Byte](chars.length)
    var i = 0
    while (i < chars.length) { bytes(i) = Bpe.charToByte(chars.charAt(i)); i += 1 }
    new String(bytes, UTF_8)
  }
}

/** exact BPE token count, codegen'd (one static call per row) */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .DataTypeMismatch(errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map("paramIndex" -> "1",
          "requiredType" -> "\"STRING\"",
          "inputSql" -> child.sql, "inputType" -> child.dataType.sql))
  }
  override def nullSafeEval(input: Any): Any =
    Bpe.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Bpe.count($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_count"
}

/** BPE token-id array, codegen'd */
case class BpeTokenIds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .DataTypeMismatch(errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map("paramIndex" -> "1",
          "requiredType" -> "\"STRING\"",
          "inputSql" -> child.sql, "inputType" -> child.dataType.sql))
  }
  override def nullSafeEval(input: Any): Any =
    Bpe.ids(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Bpe.ids($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_ids"
}
