package graft.dims

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.io.Source

/** Vendored reference dimensions (codelists, topic hierarchy levels, spell
  * dictionary, pinned MIME snapshot), loaded once from classpath resources.
  *
  * Reference behavior: pywcmp re-reads each codelist CSV from `~/.pywcmp` on
  * every record evaluation (`/root/reference/pywcmp/wcmp2/ets.py:492-514`
  * called from `ets.py:226-227,376-377,450`) and reloads the spell dictionary
  * per call (`/root/reference/pywcmp/util.py:45-59`). Here every dimension is
  * loaded exactly once per JVM and compiled into the Catalyst plan.
  *
  * Scale strategy: small dims (all of these) become `InSet` literal sets
  * inside codegen'd predicates — O(1) per-row membership, no shuffle, no
  * broadcast exchange. Dims that outgrow the in-plan threshold (e.g. a real
  * WIS2 topic hierarchy snapshot with ~1e5 topics, or a link-probe table)
  * are exposed as DataFrames for broadcast semi/anti joins instead — see
  * [[graft.engine.DatasetRules]].
  */
object Dims {

  private def loadList(resource: String): Seq[String] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource $resource")
    try Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toVector
    finally in.close()
  }

  /** CSV codelists: column 0 of every row, mirroring `get_codelist`
    * (`/root/reference/pywcmp/wcmp2/ets.py:492-514`). */
  private def loadCodelist(name: String): Seq[String] =
    loadList(s"/codelists/$name").map(_.split(",")(0))

  // --- codelists (ets.py:226, 376, 450, 517-529) -------------------------
  val resourceTypes: Seq[String]  = loadCodelist("resource-type.csv")
  val contactRoles: Seq[String]   = loadCodelist("contact-role.csv")
  /** IANA link relations ++ WCMP2 link-type codelist — bag union, exactly
    * `get_link_relations` (`ets.py:517-529`). */
  val linkRelations: Seq[String] =
    loadCodelist("link-relations-1.csv") ++ loadCodelist("link-type.csv")

  // --- topic-hierarchy levels (pywis_topics.TopicHierarchy) --------------
  /** level-3 tokens: centre ids (`ets.py:183`) */
  val centreIds: Seq[String] = loadCodelist("centre-id.csv")
  /** level-5 tokens: data policies (`ets.py:425`) */
  val dataPolicies: Seq[String] = loadCodelist("data-policy.csv")
  /** level-6 tokens: earth-system disciplines (`ets.py:348`) */
  val earthSystemDisciplines: Seq[String] =
    loadCodelist("earth-system-discipline.csv")

  /** Full valid WIS2 topics for channel validation (`th.validate`,
    * `ets.py:476`). Deterministically generated cross-product over the
    * vendored hierarchy levels; includes both fixture-valid channels
    * (`.../weather/experimental/surface-based-observations/synop` and
    * `.../weather/surface-based-observations/synop`) and excludes
    * `.../landFixed` (fixture-invalid). */
  val validTopics: Seq[String] = {
    val roots = Seq("origin/a/wis2", "cache/a/wis2")
    val mids = for {
      policy     <- dataPolicies
      discipline <- earthSystemDisciplines
      exp        <- Seq("", "experimental/")
      leaf       <- Seq("surface-based-observations/synop",
                        "surface-based-observations/temp",
                        "space-based-observations/synop")
    } yield s"data/$policy/$discipline/$exp$leaf"
    for {
      root   <- roots
      centre <- centreIds
      mid    <- mids
    } yield s"$root/$centre/$mid"
  }

  /** Pinned snapshot of `mimetypes.types_map` ∪ {bufr, grib, turtle}
    * (`/root/reference/pywcmp/wcmp2/kpi.py:347-352`); Python's map is
    * platform-dependent so a fixed vendored list is the only deterministic
    * choice. */
  val validMimes: Seq[String] = loadCodelist("mime-types.csv")

  /** Web image MIME types (`kpi.py:291-299`). */
  val webImageMimes: Seq[String] = Seq(
    "image/apng", "image/avif", "image/gif", "image/jpeg", "image/png",
    "image/svg+xml", "image/webp")

  /** Vendored spell dictionary (deterministic stand-in for
    * pyspellchecker's English frequency dict + `dictionary.txt`,
    * `/root/reference/pywcmp/util.py:45-59`). Lower-case words. */
  val dictionary: Seq[String] = loadList("/codelists/dictionary.txt")

  /** Each dim as a DataFrame for join-based membership when a dim outgrows
    * in-plan `InSet` (referential anti-joins in DatasetRules use these). */
  def dimDf(spark: SparkSession, name: String, values: Seq[String]): DataFrame = {
    import spark.implicits._
    values.toDF(name)
  }
}
