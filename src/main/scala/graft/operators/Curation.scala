package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Corpus-curation operators for training-data pipelines: deterministic
  * hash sampling (flat + stratified), per-source document caps (the
  * "domain cap" rule of web-scale corpus recipes), and a filter funnel
  * with per-rule drop attribution.
  *
  * All sampling decisions are pure functions of the row key — no RNG, no
  * `rand()` — so a sample is reproducible across runs, engines, cluster
  * sizes and retries (a task retry re-derives the identical decision; a
  * `rand()` sample would not survive recomputation under lineage). The
  * decision is expressed over `md5` hex text so a DuckDB/SQL oracle can
  * re-derive the exact row set with its own built-ins. */
object Curation {

  /** 8-hex-digit lowercase decision threshold for a rate in [0,1]:
    * a row is kept iff the first 8 md5 hex chars of its key compare
    * lexicographically below this. 8 hex digits = 32 bits of the hash,
    * so the realized rate is exact to ~2^-32. rate=1.0 returns "g",
    * which sorts above every hex string — keep-all. */
  private[graft] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    val t = math.round(rate * 4294967296.0) // 16^8
    if (t >= 4294967296L) "g" else f"$t%08x"
  }

  /** Keep-decision for one row: first 8 hex chars of md5(key ":" seed)
    * below the rate threshold. Narrow, codegen'd, pushdown-friendly —
    * at 100 TB this is a scan-side filter, zero shuffle. Different seeds
    * give independent samples (disjointness is NOT guaranteed — each seed
    * re-hashes). */
  def hashKeep(key: Column, rate: Double, seed: String = ""): Column =
    substring(md5(concat(key.cast(StringType), lit(":" + seed))), 1, 8) <
      lit(thresholdHex(rate))

  /** Deterministic flat sample: filter by [[hashKeep]] on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 seed: String = ""): DataFrame =
    df.where(hashKeep(col(keyCol), rate, seed))

  /** Deterministic stratified sample: per-stratum keep rates (e.g.
    * up-sample rare languages, down-sample English) with a default for
    * unlisted strata. Still one narrow filter — the per-stratum threshold
    * is a when-chain over the stratum column, not a join. */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       keyCol: String, seed: String = ""): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit(thresholdHex(defaultRate))) { case (acc, (stratum, rate)) =>
      when(col(strataCol) === stratum, lit(thresholdHex(rate))).otherwise(acc)
    }
    df.where(
      substring(md5(concat(col(keyCol).cast(StringType), lit(":" + seed))),
        1, 8) < thr)
  }

  /** Per-source cap: keep at most `k` documents per source, chosen
    * deterministically as the first `k` in `orderCol` order (the "domain
    * cap" against boilerplate-heavy hosts dominating a web corpus).
    *
    * Shape at 100 TB: a single window over `source` would hash-partition
    * the FULL corpus by source — one hot domain (a crawl can be 10%
    * one host) lands on one task. Instead a salted pre-prune runs first:
    * rows are window-ranked within (source, salt) where salt =
    * xxhash64(orderCol) mod `salts`, spreading a hot source over `salts`
    * tasks and keeping at most k per salt bucket. The pre-prune is
    * CONSERVATIVE for any salt assignment (the global first-k of a source
    * is always contained in the union of per-bucket first-ks), so the
    * second, exact window over `source` sees at most k*salts rows per
    * source — driver-bounded, skew-immune. `orderCol` must be unique per
    * source for a deterministic result (doc ids are). */
  def perSourceCap(df: DataFrame, sourceCol: String = "source",
                   orderCol: String = "doc_id", k: Int = 1000,
                   salts: Int = 64): DataFrame = {
    require(k >= 1 && salts >= 1)
    val local = Window
      .partitionBy(col(sourceCol), pmod(xxhash64(col(orderCol)), lit(salts)))
      .orderBy(col(orderCol))
    val pruned = df
      .withColumn("_rn_local", row_number().over(local))
      .where(col("_rn_local") <= k)
      .drop("_rn_local")
    val global = Window.partitionBy(col(sourceCol)).orderBy(col(orderCol))
    pruned
      .withColumn("_rn", row_number().over(global))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Survivors of a sequential rule funnel: rows passing EVERY rule.
    * One conjunctive narrow filter — rules push down to the scan. */
  def applyFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    df.where(rules.map(_._2).reduce(_ && _))

  /** Filter-funnel accounting: for each rule, how many rows that survived
    * all EARLIER rules this rule drops (the standard corpus-cleaning
    * funnel report — each document is attributed to the FIRST rule that
    * rejects it, so the drops sum to n_in - n_out).
    *
    * One aggregation pass over the corpus (a naive per-rule count would
    * scan |rules| times): cumulative-survival columns are built as nested
    * AND chains inside a single agg projection, map-side partial, one
    * 1-row exchange. Returns one row per rule:
    * `(rule_seq, rule, n_evaluated, n_dropped, n_remaining)`. */
  def filterFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    // a NULL condition (e.g. a predicate over a null column) rejects the
    // row AT that rule, exactly like SQL WHERE — normalize once so the
    // survival chain and the drop attribution can't disagree on nulls
    val passed = rules.map { case (_, cond) => coalesce(cond, lit(false)) }
    // survivedBefore(i) = passed rules 0..i-1
    val survivedBefore = passed.scanLeft(lit(true))(_ && _)
    val dropAggs = passed.zipWithIndex.map { case (p, i) =>
      sum(when(survivedBefore(i) && !p, 1L).otherwise(0L)).as(s"_drop_$i")
    }
    val wide = df.agg(count(lit(1)).as("_n_in"), dropAggs: _*)
    // long form: remaining_i = n_in - (drop_0 + .. + drop_i)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      val before = col("_n_in") -
        (0 until i).map(j => col(s"_drop_$j")).foldLeft(lit(0L))(_ + _)
      struct(
        lit(i + 1).as("rule_seq"), lit(name).as("rule"),
        before.as("n_evaluated"), col(s"_drop_$i").as("n_dropped"),
        (before - col(s"_drop_$i")).as("n_remaining"))
    }
    wide
      .select(explode(array(rows: _*)).as("f"))
      .select("f.*")
  }
}
