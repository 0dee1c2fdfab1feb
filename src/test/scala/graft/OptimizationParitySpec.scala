package graft

import java.util.regex.Pattern

import org.apache.spark.sql.functions._
import graft.functions.{Wcmp2Functions => F}
import graft.sources.RecordTable

/** Round-6 optimization parity pins: every hot-path rewrite is asserted
  * byte/token-identical to the formulation it replaced (the optimization
  * round must not change what any declared query computes). */
class OptimizationParitySpec extends SparkSpec {
  import spark.implicits._

  test("synthesize: precomputed-template parity with the replace() form") {
    // the ORIGINAL per-row formulation (round <=5), re-stated here as the
    // reference: replace(template, idLine, newId) then bucket-conditional
    // replace / regexp_replace over the content
    val template = RecordTable.fixtureContent("wcmp2-passing.json")
    def rep(c: org.apache.spark.sql.Column, s: String,
            r: org.apache.spark.sql.Column) =
      call_function("replace", c, lit(s), r)
    val bucket = pmod(col("i"), lit(20))
    val idLine = "urn:wmo:md:ca-eccc-msc:weather.observations.swob-realtime"
    val localId = concat(lit("observations.r"), col("i"))
    val newId = concat(
      when(bucket === 14, "urn:wmo:md:bad-centre-id:")
        .otherwise("urn:wmo:md:ca-eccc-msc:"),
      when(bucket === 15, concat(lit("obs r"), col("i"))).otherwise(localId))
    val content0 = rep(lit(template), idLine, newId)
    val content1 = when(bucket === 16,
        rep(content0, "\"created\": \"2018-01-01T11:11:11Z\"",
          lit("\"created\": \"None\"")))
      .when(bucket === 17, rep(content0, "-142,", lit("-242,")))
      .when(bucket === 18,
        regexp_replace(content0, ",\\s*\"wmo:dataPolicy\": \"core\"", ""))
      .when(bucket === 19, rep(content0, "\"rel\": \"data\",",
        lit("\"rel\": \"download\",")))
      .otherwise(content0)
    val n = 200L // covers all 20 buckets 10x, ids of varying digit widths
    val reference = spark.range(0, n, 1, 4).toDF("i")
      .select(col("i"), content1.as("content"))
      .as[(Long, String)].collect().toMap
    val optimized = RecordTable.synthesize(spark, n)
      .select(regexp_extract(col("path"), "records/([0-9]+)", 1)
        .cast("long").as("i"), col("content"))
      .as[(Long, String)].collect().toMap
    assert(optimized.keySet == reference.keySet)
    reference.foreach { case (i, c) =>
      assert(optimized(i) == c, s"content mismatch at i=$i")
    }
  }

  // token-space + free-text adversarial corpus for the spellcheck scanner
  private val adversarial = Seq(
    "", " ", "'", "''", "a", "a'", "'a", "a''b", "ab''", "ab''cd e'",
    "Surface wether observations 30 days", "x_1 foo_bar 1_000 1_000_000",
    "1e5 12e3_4 1ee 1e_5 1_ _1 1__2 nan inf infinity nan's infinitys",
    "NaN INF Infinity 0 007 3 1e 9_",
    "café Über straße grüße",         // latin-1 letters
    "étude a⃝b",                                    // Mn + Me marks
    "பால்",                                // Mc marks (Tamil)
    "١٢٣ ۱۲",                         // Arabic digits
    "a‍b zw‌nj",                                     // join controls
    "under_score __ _x_",
    "ⅠⅡ 〇",                                     // Nl letter-numbers
    "tab\tsep\nlinevtff\rcr end  ",
    "mixed: j'ai l'été, d'accord-ish; 12,5 3.14 v2.0")

  test("misspelled scanner: token parity with the declarative regex form") {
    val kernel = adversarial.toDF("s")
      .select(graft.expressions.Misspelled.misspelled(col("s")))
      .as[Seq[String]].collect()
    val declarative = adversarial.toDF("s")
      .select(F.misspelled(col("s"))).as[Seq[String]].collect()
    adversarial.indices.foreach { i =>
      assert(kernel(i) == declarative(i),
        s"spellcheck mismatch on '${adversarial(i)}'")
    }
  }

  test("isWordCp matches (?U)\\w over the whole BMP + supplementary edge") {
    val w = Pattern.compile("(?U)\\w")
    (0 to 0xFFFF).foreach { cp =>
      if (!Character.isSurrogate(cp.toChar)) {
        val expected = w.matcher(new String(Character.toChars(cp))).matches()
        assert(graft.expressions.TextKernels.isWordCp(cp) == expected,
          f"isWordCp mismatch at U+$cp%04X")
      }
    }
    // a few supplementary-plane codepoints (letters, digits, symbols)
    Seq(0x10400, 0x104A0, 0x1D7CE, 0x1F600, 0x20000).foreach { cp =>
      val expected = w.matcher(new String(Character.toChars(cp))).matches()
      assert(graft.expressions.TextKernels.isWordCp(cp) == expected,
        f"isWordCp mismatch at U+$cp%04X")
    }
  }

  test("floatLikeToken matches the floatLike regex over token space") {
    val re = Pattern.compile(F.floatLike)
    // token space = lowercased \w/' runs; enumerate a dense adversarial set
    val toks = Seq("inf", "infinity", "nan", "in", "infinit", "nans",
      "0", "9", "007", "1_0", "1_000_000", "1_", "_1", "1__2", "1e5",
      "12e3_4", "1ee5", "1e_5", "1e", "e5", "12e", "1e5e5", "abc", "a1",
      "1a", "x_1", "_", "'", "1'2", "nan'", "١٢", "1٦2",
      "999999999999999999999999", "1e999", "0e0", "00_0e0_0")
    toks.foreach { t =>
      assert(graft.expressions.TextKernels.floatLikeToken(t) ==
        re.matcher(t).find(), s"floatLikeToken mismatch on '$t'")
    }
  }

  test("titleWords: char-scan strip/split parity with the regex form") {
    val titles = Seq("", " ", "  Surface   weather  ", "\tAB\fC\rD\nE ",
      "NOAA GOES-16 imagery", "x", " x ", "a  b", "café été",
      "ACRONYM2 and WMO4 plus lower", " nbsp stays ")
    // reference: the pre-r6 regex formulation
    val leadWs = Pattern.compile("^\\s+")
    val trailWs = Pattern.compile("\\s+$")
    val wsRun = Pattern.compile("\\s+")
    val acronymRe = Pattern.compile("\\b([A-Z]{2,}\\d*)\\b")
    def pyStripRef(s: String): String =
      trailWs.matcher(leadWs.matcher(s).replaceAll("")).replaceAll("")
    val got = titles.toDF("s")
      .select(graft.expressions.TitleWords.titleWords(col("s")).as("t"))
      .select("t.words", "t.stripped")
      .as[(Seq[String], String)].collect()
    titles.zip(got).foreach { case (s, (words, stripped)) =>
      val refStripped0 = pyStripRef(s)
      val refWords =
        if (refStripped0.isEmpty) Seq.empty[String]
        else wsRun.split(refStripped0).filter(_.nonEmpty).toSeq
      val refAcr = pyStripRef(acronymRe.matcher(s).replaceAll(""))
      assert(words == refWords, s"words mismatch on '$s'")
      assert(stripped == refAcr, s"stripped mismatch on '$s'")
    }
  }
}
