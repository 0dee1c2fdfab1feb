package graft.sources

import java.io.{ByteArrayInputStream, File, FileOutputStream}
import java.util.zip.ZipInputStream

/** S6 tooling: `pywcmp bundle sync` analog
  * (`/root/reference/pywcmp/bundle.py:51-112`) — builds a dims directory
  * from the published sources so deployments refresh schema / codelists /
  * topic tables WITHOUT a rebuild: point the engine at the result with
  * `-Dgraft.dims.dir=<dest>` ([[graft.dims.Dims.DimsDirProperty]]).
  *
  * Mirrors the reference artifact-for-artifact:
  *  - the bundled WCMP2 schema JSON (`bundle.py:64-69`)
  *  - the WCMP2 codelists zip, every `.csv` entry extracted by basename
  *    (`bundle.py:71-90`)
  *  - the WIS2 topic-hierarchy bundle zip, every entry extracted by
  *    basename (`bundle.py:92-107`)
  *  - the IANA link-relations CSV (`bundle.py:109-113`)
  *
  * Transport is the same `java.net` stack as [[UrlSource]] (http(s) in
  * production, `file://`/loopback-HTTP in this zero-egress sandbox's
  * tests — identical code path). Unlike the reference's hard raise, each
  * artifact syncs independently and failures are returned, so one
  * unreachable host doesn't void the rest; the CLI still exits non-zero
  * if anything failed. This is driver-side setup tooling — no Spark
  * session involved.
  */
object BundleSync {

  /** The published source URLs (the reference's constants,
    * `bundle.py:64,74,95,109`). Each overridable — tests point them at
    * loopback servers, air-gapped deployments at internal mirrors. */
  case class Sources(
    schemaUrl: String =
      "https://raw.githubusercontent.com/wmo-im/wcmp2/main/schemas/wcmp2-bundled.json",
    codelistsZipUrl: String =
      "https://github.com/wmo-im/wcmp2-codelists/archive/refs/heads/main.zip",
    topicsZipUrl: String =
      "https://wmo-im.github.io/wis2-topic-hierarchy/wth-bundle.zip",
    ianaUrl: String =
      "https://www.iana.org/assignments/link-relations/link-relations-1.csv")

  /** Files written (dest-relative) and per-artifact failures. */
  case class Synced(files: Seq[String], errors: Seq[String])

  /** Fetch via the shared redirect-following transport
    * ([[UrlSource.openFollowing]] — one definition for prober + sync).
    * Any remaining non-2xx terminal status is an ERROR — silently
    * writing a redirect/error body as the artifact would corrupt the
    * dims dir while exiting 0. */
  private def fetchBytes(url: String, timeoutMs: Int): Array[Byte] =
    UrlSource.openFollowing(url, "GET", timeoutMs, hops = 10) match {
      case h: java.net.HttpURLConnection =>
        val status = h.getResponseCode
        if (status >= 300) {
          h.disconnect()
          throw new java.io.IOException(s"HTTP $status for $url")
        }
        val in = h.getInputStream
        try in.readAllBytes() finally in.close()
      case c =>
        val in = c.getInputStream
        try in.readAllBytes() finally in.close()
    }

  private def write(dest: File, name: String, bytes: Array[Byte]): String = {
    val f = new File(dest, name)
    val out = new FileOutputStream(f)
    try out.write(bytes) finally out.close()
    name
  }

  /** Decompression-bomb cap per zip entry: a mirror (the Sources URLs
    * are explicitly overridable) serving a few-KB entry that deflates to
    * many GB must fail the sync step, not OOM the driver. Dims artifacts
    * are CSVs and a JSON schema — comfortably under this. */
  val MaxEntryBytes: Int = 64 * 1024 * 1024

  /** Extract zip entries into `dest` flat by basename. `csvOnly` mirrors
    * the codelists branch (`'.csv' in name`, `bundle.py:79`); the topics
    * branch takes every file entry. Entry names are UNTRUSTED: only the
    * basename is ever used, so `../`-style zip-slip paths cannot escape
    * `dest`; entry bytes are capped at [[MaxEntryBytes]]. */
  private def extractZip(dest: File, bytes: Array[Byte],
                         csvOnly: Boolean): Seq[String] = {
    val out = Seq.newBuilder[String]
    val z = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = z.getNextEntry
      while (e != null) {
        val base = new File(e.getName).getName
        val take = !e.isDirectory && base.nonEmpty &&
          (!csvOnly || e.getName.contains(".csv"))
        if (take) out += write(dest, base, readCapped(z, base))
        z.closeEntry()
        e = z.getNextEntry
      }
    } finally z.close()
    out.result()
  }

  private[graft] def readCapped(z: ZipInputStream, name: String,
                                cap: Int = MaxEntryBytes): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](64 * 1024)
    var n = z.read(chunk)
    while (n >= 0) {
      buf.write(chunk, 0, n)
      if (buf.size() > cap)
        throw new java.io.IOException(
          s"zip entry '$name' exceeds $cap bytes (bomb cap)")
      n = z.read(chunk)
    }
    buf.toByteArray
  }

  def sync(dest: File, sources: Sources = Sources(),
           timeoutMs: Int = 30000): Synced = {
    dest.mkdirs()
    val files = Seq.newBuilder[String]
    val errors = Seq.newBuilder[String]
    def step(what: String)(body: => Seq[String]): Unit =
      try files ++= body
      catch { case e: Exception =>
        errors += s"$what: ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    step("schema") {
      Seq(write(dest, "wcmp2-bundled.json",
        fetchBytes(sources.schemaUrl, timeoutMs)))
    }
    step("codelists") {
      extractZip(dest, fetchBytes(sources.codelistsZipUrl, timeoutMs),
        csvOnly = true)
    }
    step("topics") {
      extractZip(dest, fetchBytes(sources.topicsZipUrl, timeoutMs),
        csvOnly = false)
    }
    step("iana") {
      Seq(write(dest, "link-relations-1.csv",
        fetchBytes(sources.ianaUrl, timeoutMs)))
    }
    Synced(files.result(), errors.result())
  }
}
