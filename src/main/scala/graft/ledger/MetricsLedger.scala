package graft.ledger

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import scala.jdk.CollectionConverters._

/** Per-partition metrics checkpoint with atomic commits — the engine's
  * resumability story (north rule: "per-partition lineage and metrics
  * checkpoints ... so a restarted job skips verified partitions").
  *
  * The table shape targeted is Iceberg's metrics-table pattern; with no
  * Iceberg runtime jar in this sandbox (SURVEY.md §7.4-7) the commit
  * protocol is the same one Iceberg's file IO uses underneath: write to a
  * temp file, fsync, atomic rename. One ledger entry per `lang` partition
  * carries the row count and the order-independent sha256-CRC fingerprint
  * produced by [[graft.engine.Validator.partitionVerdicts]], so a resumed
  * run (a) skips committed partitions and (b) can later prove input
  * equality against the fingerprint. Swapping this for an Iceberg metrics
  * table is a config change, not a code change.
  */
class MetricsLedger(dir: String) {
  private val root: Path = Paths.get(dir)
  Files.createDirectories(root)

  case class Entry(lang: String, records: Long, failedRecords: Long,
                   shaFingerprint: Long, verdict: String)

  private def fileFor(lang: String): Path =
    root.resolve(s"lang=${lang}.commit")

  /** Atomically commit one partition's metrics (temp + rename). */
  def commit(e: Entry): Unit = {
    val tmp = Files.createTempFile(root, s".${e.lang}", ".tmp")
    val payload =
      s"""{"lang":"${e.lang}","records":${e.records},""" +
      s""""failed_records":${e.failedRecords},""" +
      s""""sha_fingerprint":${e.shaFingerprint},"verdict":"${e.verdict}"}"""
    Files.write(tmp, payload.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, fileFor(e.lang), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Langs already verified and committed. (`Files.list` streams must be
    * closed per its javadoc — `Using` guarantees it.) */
  def committedLangs(): Set[String] =
    scala.util.Using.resource(Files.list(root)) { stream =>
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".commit"))
        .map(_.stripPrefix("lang=").stripSuffix(".commit"))
        .toSet
    }

  def read(lang: String): Option[String] = {
    val f = fileFor(lang)
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
    else None
  }

  /** Resume filter: drop partitions already committed. With `lang` as the
    * table's physical partition column this prunes whole directories at
    * the scan (the `NOT IN` compiles to partition-pruning predicates). */
  def pendingOnly(records: DataFrame): DataFrame = {
    val done = committedLangs()
    if (done.isEmpty) records
    else records.where(!col("lang").isInCollection(done.toSeq))
  }

  /** Commit every partition verdict row (driver-side: |langs| rows). */
  def commitVerdicts(verdicts: DataFrame): Unit = {
    verdicts.select("lang", "records", "failed_records", "sha_fingerprint",
      "verdict").collect().foreach { r: Row =>
      commit(Entry(r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    }
  }
}
