package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion-side validation/projection operators (SURVEY.md §2.2):
  * P1 magic-byte MIME sniffing, P2 validation-predicate accumulation,
  * S2 content-hash idempotent ingest. All per-row `when` chains —
  * codegen'd conditional projections, no control flow.
  */
object Validation {

  /** Magic-byte prefixes (reference `ingestion_service.py:134,145,149`),
    * shared between the Spark `when` chain, the fixtures, and the DuckDB
    * oracle so all three stay byte-identical. */
  val zipMagic = "PK\u0003\u0004"
  val oleMagic = "\u00d0\u00cf\u0011\u00e0"

  /** P1 — MIME sniffing by content prefix (reference
    * `ingestion_service.py:128-155`): %PDF→pdf; PK\x03\x04 + "word/"
    * marker→docx (bare PK→zip); OLE2 magic→doc; Return-Path:/
    * MIME-Version: near the head→eml; else octet-stream. `head` is the
    * leading bytes as STRING (testdata carries no binary; over real data
    * the same chain runs on `substring(content, 1, 500)` of a
    * binaryFile scan). */
  def sniffMime(head: Column): Column =
    when(head.startsWith("%PDF"), "application/pdf")
      .when(head.startsWith(zipMagic) && instr(head, "word/") > 0,
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document")
      .when(head.startsWith(zipMagic), "application/zip")
      .when(head.startsWith(oleMagic), "application/msword")
      .when(instr(substring(head, 1, 500), "Return-Path:") > 0 ||
        instr(substring(head, 1, 500), "MIME-Version:") > 0, "message/rfc822")
      .when(instr(lower(substring(head, 1, 100)), "<!doctype html") > 0 ||
        instr(lower(substring(head, 1, 100)), "<html") > 0, "text/html")
      .otherwise("application/octet-stream")

  /** P2 — validation predicates accumulated into an error list (reference
    * `ingestion_service.py:157-218`): size bounds + supported-type check.
    * Emits `errors` (comma-joined for cross-engine hashing) and
    * `is_valid`. */
  def validate(docs: DataFrame, maxChars: Long, langWhitelist: Seq[String],
               textCol: String = "text", langCol: String = "lang"): DataFrame = {
    val errs = array_compact(array(
      when(length(trim(col(textCol))) === 0, "empty_content"),
      when(col("n_chars") > maxChars, "file_too_large"),
      when(!col(langCol).isin(langWhitelist: _*), "unsupported_type")))
    docs
      .withColumn("errors", array_join(errs, ","))
      .withColumn("is_valid", size(errs) === 0)
  }

  /** S2 — content-hash idempotent ingest: drop incoming docs whose
    * fingerprint is already in `existing` (read-through cache as a
    * left-anti join; reference `ingestion_service.py:92-106,294-299`). */
  def newDocsOnly(incoming: DataFrame, existing: DataFrame,
                  textCol: String = "text"): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    incoming.withColumn("fp", fp)
      .join(existing.select(TextAnalysis.fingerprint(col(textCol)).as("fp")),
        Seq("fp"), "left_anti")
  }

  /** A2/A5/E6 — pipeline usage counters via `Dataset.observe`: metrics
    * ride the job (collected by QueryExecutionListener / available after
    * any action) instead of a second aggregation pass — the Spark face of
    * the reference's success/total counters and embedding usage stats
    * (`ingestion_service.py:413-414`, `embedding_generator.py:169-179`). */
  private val usageAggs: Seq[Column] = Seq(
    count(lit(1)).as("total"),
    count(when(col("is_valid"), 1)).as("valid"),
    sum(length(col("text"))).as("chars_processed"))

  def withUsageCounters(validated: DataFrame, name: String = "ingest_metrics"): DataFrame =
    validated.observe(name, usageAggs.head, usageAggs.tail: _*)

  /** Same counters harvested through an [[org.apache.spark.sql.Observation]]
    * handle — the batch-job face: `obs.get` blocks until the first action
    * on the returned frame completes, with no listener bookkeeping. */
  def withUsageCounters(validated: DataFrame,
                        obs: org.apache.spark.sql.Observation): DataFrame =
    validated.observe(obs, usageAggs.head, usageAggs.tail: _*)

  /** Fixture rows for the P1 MIME chain (FIXTURES.md §B4) — one per
    * branch, usable by both the Spark query and a VALUES-based oracle. */
  val mimeFixtures: Seq[(String, String)] = Seq(
    ("pdf_ok", "%PDF-1.4 body %%EOF"),
    ("docx", zipMagic + " word/document.xml"),
    ("zip", zipMagic + " other"),
    ("doc_ole", oleMagic + "rest"),
    ("eml_rp", "Return-Path: <a@b.c>"),
    ("eml_mime", "Date: x MIME-Version: 1.0"),
    ("html_doc", "<!DOCTYPE html><html><body>x"),
    ("html_upper", "  <HTML><head><title>t</title>"),
    ("junk", "hello world"))

  def mimeFixturesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    mimeFixtures.toDF("name", "head")
  }
}
