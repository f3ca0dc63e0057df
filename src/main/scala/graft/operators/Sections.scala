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
  * Re-expressed as a pure per-row generator (no per-document loop, and —
  * unlike the explode→window→group formulation — no shuffle at all):
  * header positions come from one `filter(sequence(...))` pass over the
  * line array, section spans from the positions, and the (title, body)
  * structs from a `transform` + `explode`. Parallelism = input splits;
  * at 100 TB the operator never moves a byte across the network, the
  * same property the other chunkers (C2/C6/CDC) already have.
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
    // _lines / _hpos are materialized as plain attributes in their own
    // projections: both are referenced inside lambda bodies below, and an
    // inlined once-used alias re-evaluates per element (the interpreted-
    // HOF pitfall documented in Dedup.shinglesFromWords).
    val withLines = docs.select(col(idCol).as("document_id"),
      split(col(textCol), "\n").as("_lines"))
    // 1-based positions of header lines, one regex pass over the lines
    val withHpos = withLines.withColumn("_hpos",
      filter(sequence(lit(1), size(col("_lines"))),
        i => isHeader(element_at(col("_lines"), i))))
    // section k spans lines (_starts[k], _ends[k]): the pseudo-header at
    // position 0 is the "Introduction" preamble before the first header
    val withSpans = withHpos.select(col("document_id"), col("_lines"),
      concat(array(lit(0)), col("_hpos")).as("_starts"),
      concat(col("_hpos"), array(size(col("_lines")) + 1)).as("_ends"))
    val sections = transform(sequence(lit(0), size(col("_starts")) - 1), k =>
      struct(
        k.cast("long").as("section_idx"),
        when(k === 0, lit("Introduction"))
          .otherwise(trim(element_at(col("_lines"), element_at(col("_starts"), k + 1))))
          .as("section_title"),
        // trim ALL whitespace, not just spaces: the reference strip()s
        // section content, so a section ending in blank lines must not
        // keep a trailing newline (caught by the generative cross-check)
        trim(array_join(slice(col("_lines"),
          element_at(col("_starts"), k + 1) + 1,
          element_at(col("_ends"), k + 1) - element_at(col("_starts"), k + 1) - 1),
          "\n"), " \t\n\r").as("content")))
    withSpans
      .select(col("document_id"), explode(sections).as("s"))
      .select(col("document_id"), col("s.section_idx").as("section_idx"),
        col("s.section_title").as("section_title"), col("s.content").as("content"))
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
