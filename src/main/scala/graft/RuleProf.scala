package graft

import org.apache.spark.sql.functions._
import graft.catalog.{EtsRules, KpiRules, OfflineLinkProbe, RecordCols}
import graft.sources.RecordTable

/** scratch: per-rule cost attribution over the REAL parse pipeline (not
  * driver contract) — each ETS/KPI rule forced alone on top of the
  * shared JsonFacts barrier, so the difference between rules is the
  * rule expression itself. */
object RuleProf {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val n = sys.env.getOrElse("SPARK_GRAFT_ROWS", "200000").toLong
    val records = RecordTable.synthesize(spark, n)

    val parsedStruct = graft.expressions.JsonFacts.jsonFacts(col("content"))
    val withParsed = records
      .select(col("*"), explode(array(parsedStruct)).as("_p"))
    val titleCol = col("_p.rec.properties.title")
    val kernels = struct(
      graft.expressions.Misspelled.misspelled(titleCol).as("title_mis"),
      graft.expressions.Misspelled.misspelled(
        col("_p.rec.properties.description")).as("desc_mis"),
      graft.expressions.TitleWords.titleWords(titleCol).as("title_kernel"),
      graft.expressions.LinkPoolExpr.linkPool(
        col("_p.rec.links"),
        col("_p.rec.properties.themes"),
        col("_p.rec.properties.contacts")).as("http_links"),
      graft.expressions.Previews.previews(col("_p.rec.links"))
        .as("previews"))
    val base = withParsed.select(col("*"), explode(array(kernels)).as("_k"))
    val rc0 = RecordCols(col("content"), col("_p.rec"),
      col("_p.geom_raw"), col("_p.geo_positions"), col("_p.props_keys"))
    val rc = rc0.copy(
      titleMisspelledOpt = Some(col("_k.title_mis")),
      descMisspelledOpt = Some(col("_k.desc_mis")),
      pre = Map(
        "title_words" -> col("_k.title_kernel.words"),
        "title_stripped" -> col("_k.title_kernel.stripped"),
        "title_all_alnum" -> col("_k.title_kernel.all_alnum"),
        "title_cap_ok" -> col("_k.title_kernel.cap_ok"),
        "title_n_acronyms" -> col("_k.title_kernel.n_acronyms"),
        "title_has_bulletin" -> col("_k.title_kernel.has_bulletin"),
        "http_links" -> col("_k.http_links"),
        "previews" -> col("_k.previews")))

    def time(name: String, c: org.apache.spark.sql.Column): Unit = {
      // warm once, then best of 2
      def pass(): Double = {
        val (_, s) = Bench.time(
          base.agg(sum(crc32(to_json(struct(c.as("v")))))).collect())
        s
      }
      pass()
      val s = math.min(pass(), pass())
      System.err.println(f"[ruleprof] $name%-28s $s%6.2fs (${n / s}%.0f rows/s)")
    }
    // baseline: parse + kernels barrier only
    time("BASE(parse+kernels)", lit(1))
    EtsRules.catalog(rc).foreach(rule => time("ets:" + rule.name, rule.result))
    KpiRules.catalog(rc, OfflineLinkProbe).foreach(rule =>
      time("kpi:" + rule.name, rule.result))
    spark.stop()
  }
}
