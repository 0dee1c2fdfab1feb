package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.util.regex.Pattern

import scala.collection.mutable

/** Deterministic BPE merge-table trainer (Sennrich et al. 2016): produces
  * `src/main/resources/bpe/merges.txt` for [[graft.expressions.Bpe]].
  *
  * Zero-egress sandbox: a published merges table cannot be downloaded, so
  * the repo vendors one trained reproducibly from the data it ships with —
  * the driver-synthesized documents corpus plus the WCMP2 fixture records
  * (JSON text exercises punctuation/structure tokens the word corpus
  * lacks). Production users drop in any GPT-2-format merges file.
  *
  * Determinism: pretokens and pair counts are accumulated in insertion
  * order but every argmax tie-breaks lexicographically on the pair, so the
  * output is a pure function of the input corpus.
  *
  * Usage: `sbt "runMain graft.tools.TrainBpe <sfDir> <nMerges> <out>"`.
  */
object TrainBpe {

  private val pretoken = Pattern.compile(
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+")

  private def mapBytes(tok: String): Vector[String] =
    tok.getBytes(UTF_8).toVector
      .map(b => graft.expressions.Bpe.byteToChar(b & 0xFF).toString)

  /** train `nMerges` merges from weighted pretoken counts */
  def train(wordCounts: Map[Vector[String], Long],
            nMerges: Int): Seq[(String, String)] = {
    var words = wordCounts.toVector
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val pairCounts = mutable.Map[(String, String), Long]()
      words.foreach { case (w, c) =>
        w.zip(w.drop(1)).foreach { p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max count, lexicographic pair tie-break -> deterministic
        val (best, cnt) = pairCounts.toVector
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        if (cnt < 2) done = true // merging singletons adds nothing
        else {
          merges += best
          val (a, b) = best
          val merged = a + b
          words = words.map { case (w, c) =>
            if (w.length < 2) (w, c)
            else {
              val out = Vector.newBuilder[String]
              var j = 0
              while (j < w.length) {
                if (j < w.length - 1 && w(j) == a && w(j + 1) == b) {
                  out += merged; j += 2
                } else { out += w(j); j += 1 }
              }
              (out.result(), c)
            }
          }
        }
      }
      i += 1
    }
    merges.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nMerges = if (args.length > 1) args(1).toInt else 2000
    val out = if (args.length > 2) args(2)
      else "src/main/resources/bpe/merges.txt"

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("graft-train-bpe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import spark.implicits._
    val docTexts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").as[String].collect()
    val fixtureTexts = graft.sources.RecordTable.fixtures(spark)
      .select("content").as[String].collect()

    val counts = mutable.LinkedHashMap[Vector[String], Long]()
    (docTexts ++ fixtureTexts).foreach { t =>
      val m = pretoken.matcher(t)
      while (m.find()) {
        val w = mapBytes(m.group())
        counts(w) = counts.getOrElse(w, 0L) + 1
      }
    }
    System.err.println(s"[train-bpe] ${counts.size} distinct pretokens, " +
      s"${counts.values.sum} total")

    val merges = train(counts.toMap, nMerges)
    System.err.println(s"[train-bpe] trained ${merges.length} merges")

    val path = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(path.getParent)
    val body = ("#version: graft-bpe-1 " +
      "(deterministic trainer: graft.tools.TrainBpe)") +:
      merges.map { case (a, b) => s"$a $b" }
    java.nio.file.Files.write(path,
      body.mkString("", "\n", "\n").getBytes(UTF_8))
    println(s"wrote ${merges.length} merges to $out")
    spark.stop()
  }
}
