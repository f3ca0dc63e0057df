package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C1 — section splitting by header detection, plus C9/P4 embed-text
  * assembly (SURVEY.md §2.3).
  *
  * The reference scans lines and opens a new section whenever a line
  * matches one of four header shapes (ALL-CAPS heading with colon,
  * numbered clause with capitalized title, `Section N: Title`,
  * `(a) Capitalized` sub-clause —
  * `document_processing_service.py:273-349`, regexes :311-316), with an
  * implicit "Introduction" section for text before the first header.
  *
  * Re-expressed relationally (no per-document loop): explode lines with
  * positions → flag header lines → running count of headers = section id
  * → group. One shuffle on (doc, section); the per-group ordered
  * reassembly uses sort-by-position inside the aggregate, so the plan is
  * deterministic under any partitioning — the property that matters at
  * 100 TB where input order is never physical order.
  */
object Sections {

  /** Portable header shapes (Java regex ≡ RE2 subset for these), matching
    * the reference's four regexes (`document_processing_service.py:311-316`)
    * shape for shape: ALL-CAPS heading with colon, numbered clause with a
    * capitalized title and trailing colon, capitalized word + number
    * ("Section 1: ..."), and "(a) Capitalized" sub-clauses. */
  val headerPatterns: Seq[String] = Seq(
    "^[A-Z][A-Z\\s]+:",                          // "COVERAGE:"
    "^[0-9]+\\.\\s+[A-Z][^.]+:",                 // "1. DEFINITIONS:"
    "^[A-Z][a-z]+\\s+[0-9]+[.:]\\s*[A-Z][^.]+",  // "Section 1: Coverage Details"
    "^\\([a-z]\\)\\s*[A-Z][^.]+")                // "(a) Premium Payment"

  def isHeader(line: Column): Column =
    headerPatterns.map(line.rlike(_)).reduce(_ || _)

  /** C1 — one row per (document, section): `chunk_id, document_id,
    * section_idx, section_title, content, chunk_type, word_count`.
    * Sections with empty bodies are dropped (reference keeps only
    * non-empty section content). */
  def sectionChunks(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val lines = docs.select(col(idCol).as("document_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
      .withColumn("is_header", isHeader(col("line")))
    val w = Window.partitionBy(col("document_id")).orderBy(col("line_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lines
      .withColumn("section_idx", sum(col("is_header").cast("int")).over(w))
      .groupBy(col("document_id"), col("section_idx"))
      .agg(
        coalesce(max(when(col("is_header"), trim(col("line")))), lit("Introduction"))
          .as("section_title"),
        // collect_list drops nulls, so non-header-only; array_sort on the
        // (line_idx, line) struct restores document order regardless of
        // partitioning.
        array_join(
          transform(array_sort(collect_list(when(!col("is_header"),
            struct(col("line_idx"), col("line"))))), s => s.getField("line")),
          "\n").as("body"))
      .withColumn("content", trim(col("body")))
      .filter(length(col("content")) > 0)
      .select(
        concat_ws("_", col("document_id"), concat(lit("s"), col("section_idx")))
          .as("chunk_id"),
        col("document_id"), col("section_idx"), col("section_title"),
        col("content"), lit("section").as("chunk_type"),
        Chunking.wordCount(col("content")).as("word_count"))
  }

  /** C9 + P4 — embedding-text assembly: prefix the section title when the
    * content doesn't already contain it (`vectorizer.py:51-57`), then cap
    * at `maxChars` for index metadata (`vectorizer.py:64`). */
  def embedText(chunks: DataFrame, maxChars: Int = 1000,
                titleCol: String = "section_title",
                textCol: String = "content"): DataFrame =
    chunks.withColumn("embed_text",
      substring(Chunking.withTitlePrefix(col(titleCol), col(textCol)), 1, maxChars))

  /** S7 — extraction-strategy fallback as a conditional projection
    * (`document_processing_service.py:102-154`): take the primary
    * extraction when it yields at least `minWords` words, else the
    * fallback; tag which strategy won. Per-row `when`, no control flow. */
  def extractWithFallback(docs: DataFrame, primary: Column, fallback: Column,
                          minWords: Int = 50): DataFrame = {
    val sufficient = size(split(trim(primary), "\\s+")) >= minWords
    docs
      .withColumn("extracted_text", when(sufficient, primary).otherwise(fallback))
      .withColumn("strategy", when(sufficient, "primary").otherwise("fallback"))
  }
}
