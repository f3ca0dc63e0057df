package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S1 — the URL-ingestion surface (reference
  * `ingestion_service.py:92-106,220-269`): download with retry +
  * exponential backoff, a 50 MB size cap, SHA-256 content hashing, the
  * `{md5(url)[:8]}_{sha256[:12]}{ext}` cache-file naming scheme, layered
  * MIME detection (content magic, then extension), and the
  * supported-type/size validation that gates a document into the
  * pipeline.
  *
  * The sandbox has no egress, so the fetch kernel accepts `file://` URLs
  * only — the retry loop, size cap and naming semantics are identical,
  * and an HTTP transport would swap into [[fetchUdf]] without touching
  * the plan. Spark-first shape: the URL list is a DataFrame, the fetch
  * is a per-row executor-side kernel (parallelism = partitions of the
  * url list — a 1000-executor cluster fans the download out for free),
  * and everything downstream of the fetch is plain codegen'd column
  * arithmetic. The content column is only as durable as one stage: at
  * scale you write (url, content) straight to a staging table
  * ([[graft.io.Tables]]) and run extraction from there, which is
  * exactly the S2/S3 half this feeds.
  */
object UrlIngest {

  /** Reference cap (`ingestion_service.py:56`). */
  val MaxFileSize: Long = 50L * 1024 * 1024

  val DocxMime = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"

  /** Fetch result; `error` is a stable machine string (the driver's
    * hash compare needs byte-identical output across runs). */
  case class Fetched(content: Array[Byte], attempts: Int, error: String)

  /** The `_download_with_retry` analogue (`ingestion_service.py:220-269`):
    * up to `maxRetries` attempts with exponential backoff
    * (`backoffMs * 2^attempt`; the reference sleeps 2^attempt seconds —
    * parameterized here so tests don't sleep), failing a single row —
    * never the job — with `download_failed_after_N_attempts:<kind>`.
    * Permanently-failing conditions — unsupported scheme, size cap —
    * fail FAST (attempt 1, no backoff): no retry can change them, and
    * the reference likewise validates scheme/size outside its transport
    * retry loop. Only transport errors take the backoff path. */
  def fetchUdf(maxBytes: Long, maxRetries: Int, backoffMs: Long) =
    udf((url: String) => {
      var attempt = 0
      var kind: String = null
      var fatal = false
      var out: Array[Byte] = null
      while (out == null && !fatal && attempt < maxRetries) {
        attempt += 1
        try {
          val uri = new java.net.URI(url)
          if (uri.getScheme != "file")
            throw new IllegalArgumentException("unsupported_scheme")
          val p = java.nio.file.Paths.get(uri)
          val size = java.nio.file.Files.size(p)
          if (size > maxBytes)
            throw new IllegalArgumentException("file_too_large")
          out = java.nio.file.Files.readAllBytes(p)
        } catch {
          case e: IllegalArgumentException
              if e.getMessage == "file_too_large" || e.getMessage == "unsupported_scheme" =>
            kind = e.getMessage
            fatal = true
          case scala.util.control.NonFatal(_) =>
            kind = "fetch_error"
        }
        if (out == null && !fatal && attempt < maxRetries && backoffMs > 0)
          Thread.sleep(backoffMs << (attempt - 1))
      }
      if (out != null) Fetched(out, attempt, null)
      else Fetched(null, attempt, s"download_failed_after_${attempt}_attempts:$kind")
    })

  /** Ingest a URL-list DataFrame into the reference's `DocumentInfo`
    * surface: one row per URL with cache name, size, MIME, SHA-256 hash,
    * attempt count, validity and the accumulated validation errors.
    * MIME detection is layered like `_detect_mime_type`: content magic
    * ([[Validation.sniffMime]]) first, extension fallback second.
    * Type/extension pairs follow the reference's SUPPORTED_TYPES
    * (`ingestion_service.py:47-53`). */
  def ingest(urls: DataFrame, maxBytes: Long = MaxFileSize, maxRetries: Int = 3,
             backoffMs: Long = 0L, urlCol: String = "url"): DataFrame = {
    val ext = lower(regexp_extract(col(urlCol), "(\\.[A-Za-z0-9]+)$", 1))
    val c = col("_f.content")
    val sniffed = Validation.sniffMime(c.cast("string"))
    val mime = when(sniffed === "application/octet-stream" && ext === ".txt", "text/plain")
      .otherwise(sniffed)
    val supported = mime.isin("application/pdf", DocxMime, "application/msword",
      "message/rfc822", "text/plain")
    val extOk =
      (mime === "application/pdf" && ext === ".pdf") ||
        (mime === DocxMime && ext === ".docx") ||
        (mime === "application/msword" && ext === ".doc") ||
        (mime === "message/rfc822" && ext === ".eml") ||
        (mime === "text/plain" && ext.isin(".txt", ".eml"))
    val valErrs = array_compact(array(
      when(!supported, "unsupported_type"),
      when(supported && !extOk, "extension_mismatch"),
      when(length(c) > maxBytes, "file_too_large")))
    urls
      .withColumn("_f", fetchUdf(maxBytes, maxRetries, backoffMs)(col(urlCol)))
      .select(
        col(urlCol).as("url"),
        when(c.isNotNull,
          concat(substring(md5(col(urlCol)), 1, 8), lit("_"),
            substring(sha2(c, 256), 1, 12), ext)).as("cache_name"),
        when(c.isNotNull, length(c).cast("long")).as("file_size"),
        when(c.isNotNull, mime).as("mime_type"),
        when(c.isNotNull, sha2(c, 256)).as("file_hash"),
        col("_f.attempts").as("attempts"),
        when(c.isNull, lit(false)).otherwise(size(valErrs) === 0).as("is_valid"),
        when(c.isNull, col("_f.error"))
          .otherwise(array_join(valErrs, ",")).as("errors"))
  }

  // ---- driver-query fixtures ------------------------------------------

  /** ASCII-only members so the DuckDB oracle's `read_blob` →
    * `decode()` hash replay is byte-faithful (decode rejects non-UTF8
    * bytes, so the binary formats go through the SPEC, which checks
    * against JVM-computed hashes instead). `report.pdf` is a
    * type-validation failure: `.pdf` extension, plain-text body. */
  val notesTxt: String =
    "Plain text release notes.\nNothing to extract here, but ingestion must accept txt.\n"
  val reportPdf: String = "This is not a PDF at all, just text wearing the extension.\n"

  /** Stage the S1 query fixtures to a fixed local dir (idempotent
    * overwrite) and return it — the offline stand-in for the url list's
    * remote side. The DuckDB oracle reads the same files back with
    * `read_blob`. */
  def stageQueryFixtures(dir: String = "/tmp/graft_url_stage"): String = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val files: Seq[(String, Array[Byte])] = Seq(
      "simple.eml" -> DocFixtures.simpleEml.getBytes(UTF_8),
      "multi.eml" -> DocFixtures.multiEml.getBytes(UTF_8),
      "notes.txt" -> notesTxt.getBytes(UTF_8),
      "report.pdf" -> reportPdf.getBytes(UTF_8))
    // the oracle reads this dir back by GLOB — remove anything that is
    // not the current fixture set, or a stale file makes the oracle see
    // rows the engine side never ingested
    val keep = files.map(_._1).toSet
    Option(d.listFiles()).getOrElse(Array.empty)
      .filterNot(f => keep(f.getName)).foreach(_.delete())
    files.foreach { case (n, b) =>
      java.nio.file.Files.write(new java.io.File(d, n).toPath, b)
    }
    dir
  }
}
