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

  /** Override directory for the vendored dims: start the JVM with
    * `-Dgraft.dims.dir=/path/to/tables` and any codelist file found
    * there (same filenames as `src/main/resources/codelists/`) replaces
    * the classpath copy. This is the deployment hook for the REAL
    * pywis-topics / pyspellchecker bundles: the vendored snapshots here
    * (51 centres, 6.9k-word lexicon, IANA link relations) are faithful
    * but partial, and a production WIS2 deployment should drop in the
    * full published tables without a rebuild. */
  val DimsDirProperty = "graft.dims.dir"

  private def loadList(resource: String): Seq[String] = {
    val overridden = sys.props.get(DimsDirProperty).flatMap { dir =>
      val f = new java.io.File(dir, resource.stripPrefix("/codelists/"))
      if (f.isFile) Some(Source.fromFile(f, "UTF-8")) else None
    }
    val src = overridden.getOrElse {
      val in = getClass.getResourceAsStream(resource)
      require(in != null, s"missing resource $resource")
      Source.fromInputStream(in, "UTF-8")
    }
    try src.getLines().map(_.trim).filter(_.nonEmpty).toVector
    finally src.close()
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

  /** Level-wise WIS2 topic-channel validation, the analog of
    * `th.validate(channel)` (`ets.py:476`, pywis_topics): each hierarchy
    * level is checked against that level's table, like pywis-topics
    * walking its per-level CSVs — NOT a materialized cross-product (the
    * real hierarchy has ~1e5 leaves; a level-wise check is O(depth) per
    * row and needs only the small per-level dims).
    *
    *  - levels 1-3: literal `origin|cache / a / wis2`
    *  - level 4: centre-id dim (`-test` centres allowed, as in the
    *    identifier test, `ets.py:186`)
    *  - level 5: notification type (`data|metadata|reports`)
    *  - for `data`: level 6 data-policy dim, level 7 earth-system-
    *    discipline dim, levels 8+ lowercase-kebab tokens (the published
    *    sub-discipline trees are domain-managed and too large to vendor;
    *    the charset rule matches their token grammar and correctly
    *    rejects the fixture-invalid `landFixed`). Override the dims via
    *    [[DimsDirProperty]] to pin exact sub-discipline tables.
    */
  def validTopicChannel(channel: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val t = split(channel, "/")
    val lvl = size(t)
    val kebab = "^[a-z0-9][a-z0-9-]*$"
    val rootOk = get(t, lit(0)).isInCollection(Seq("origin", "cache")) &&
      get(t, lit(1)) === "a" && get(t, lit(2)) === "wis2"
    val centre = get(t, lit(3))
    val centreOk =
      centre.isInCollection(centreIds) || centre.endsWith("-test")
    val subOk = forall(slice(t, lit(8), greatest(lvl - 7, lit(0))),
      tok => tok.rlike(kebab))
    val typeOk = when(get(t, lit(4)) === "data",
        lvl >= 7 &&
        get(t, lit(5)).isInCollection(dataPolicies) &&
        get(t, lit(6)).isInCollection(earthSystemDisciplines) && subOk)
      .when(get(t, lit(4)).isInCollection(Seq("metadata", "reports")),
        lvl >= 5 && forall(slice(t, lit(6), greatest(lvl - 5, lit(0))),
          tok => tok.rlike(kebab)))
      .otherwise(lit(false))
    rootOk && centreOk && typeOk
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
