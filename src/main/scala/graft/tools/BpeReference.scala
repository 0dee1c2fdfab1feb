package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.util.regex.Pattern

import scala.annotation.tailrec

/** Structurally INDEPENDENT implementation of the byte-level BPE spec
  * that [[graft.expressions.Bpe]] implements — the cross-check oracle for
  * the `q_token_bpe` driver query (its per-doc counts are dumped to
  * parquet; DuckDB compares them against the codegen'd kernel's counts)
  * and for the BpeSpec parity suite.
  *
  * Independence by construction: this file re-derives the byte<->unicode
  * bijection with a different formulation, re-parses
  * `/bpe/merges.txt` itself, keys ranks by STRING PAIRS (the kernel
  * interns symbols to ints and keys packed longs), and applies merges by
  * rebuilding an immutable `List[String]` per step (the kernel compacts a
  * mutable int array in place). Shared with the kernel: nothing but the
  * published spec (the GPT-2 pretokenizer pattern and the merge rule:
  * lowest-rank adjacent pair, all occurrences, left-to-right, repeat).
  *
  * Deliberately simple and O(word^2): clarity over speed — this runs once
  * per verify pass, never in the hot path.
  */
object BpeReference {

  // the GPT-2 pretokenizer pattern, written out longhand
  private val pretoken = Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d" +
      "| ?\\p{L}+" +
      "| ?\\p{N}+" +
      "| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)" +
      "|\\s+")

  /** byte -> printable char, derived by walking candidate codepoints in
    * order and skipping the non-printable latin-1 gaps (a different
    * construction of the same public bijection). */
  private val byteChar: Vector[Char] = {
    def printable(b: Int): Boolean =
      ('!'.toInt to '~'.toInt).contains(b) ||
        (0xA1 to 0xAC).contains(b) || (0xAE to 0xFF).contains(b)
    val shifted = Iterator.from(256)
    (0 to 255).map(b =>
      if (printable(b)) b.toChar else shifted.next().toChar).toVector
  }

  /** rank per merge pair, keyed by the pair's two symbol STRINGS */
  lazy val ranks: Map[(String, String), Int] = {
    val in = getClass.getResourceAsStream("/bpe/merges.txt")
    require(in != null, "missing resource /bpe/merges.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines()
        .filterNot(l => l.isEmpty || l.startsWith("#"))
        .zipWithIndex
        .map { case (l, i) =>
          val sp = l.lastIndexOf(' ')
          ((l.substring(0, sp), l.substring(sp + 1)), i)
        }.toMap
    } finally src.close()
  }

  private def toSymbols(tok: String): List[String] =
    tok.getBytes(UTF_8).toList.map(b => byteChar(b & 0xFF).toString)

  @tailrec
  private def bpeWord(word: List[String]): List[String] = {
    val pairs = word.zip(word.drop(1))
    val ranked = pairs.flatMap(p => ranks.get(p).map(r => (r, p)))
    if (ranked.isEmpty) word
    else {
      val (_, (a, b)) = ranked.minBy(_._1)
      // merge all occurrences of (a, b) left-to-right
      def go(w: List[String]): List[String] = w match {
        case x :: y :: rest if x == a && y == b => (a + b) :: go(rest)
        case x :: rest => x :: go(rest)
        case Nil => Nil
      }
      bpeWord(go(word))
    }
  }

  /** final subword symbols of the full text */
  def tokens(text: String): List[String] = {
    val m = pretoken.matcher(text)
    val out = List.newBuilder[String]
    while (m.find()) out ++= bpeWord(toSymbols(m.group()))
    out.result()
  }

  def count(text: String): Int = tokens(text).size
}
