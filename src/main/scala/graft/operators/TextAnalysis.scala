package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data-pipeline tier (builder
  * brief): language ID, quality scoring, token counting, fingerprinting.
  * All pure `functions._` compositions — codegen'd, shuffle-free
  * (per-row), so they stream through a 100 TB scan at full width.
  */
object TextAnalysis {

  /** Small public stopword/function-word lists per language, used as an
    * n-gram-free language-ID heuristic: score = number of list words
    * appearing as whitespace-delimited tokens. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "for", "was"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "es", "los", "del", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "pour", "que", "dans", "une"),
    "pt" -> Seq("o", "a", "e", "do", "da", "em", "um", "para", "com", "os"))

  private def padded(text: Column): Column =
    concat(lit(" "), lower(text), lit(" "))

  private def markerScore(text: Column, words: Seq[String]): Column =
    words.map(w => when(instr(padded(text), s" $w ") > 0, 1).otherwise(0))
      .reduce(_ + _)

  /** Language ID: argmax of marker-word hits; ties resolved by the fixed
    * language order of [[langMarkers]] (a deterministic CASE chain — the
    * same chain the DuckDB oracle evaluates). Docs with zero hits in every
    * list → "und" (undetermined). */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val scored = langMarkers.foldLeft(docs) { case (df, (lang, words)) =>
      df.withColumn(s"score_$lang", markerScore(col(textCol), words))
    }
    val best = greatest(langMarkers.map { case (l, _) => col(s"score_$l") }: _*)
    val pred = langMarkers.foldRight(lit("und"): Column) { case ((lang, _), els) =>
      when(col(s"score_$lang") === best && best > 0, lang).otherwise(els)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Quality scoring (length / punctuation / stopword ratios): the
    * heuristics a pretraining-data filter computes per document. */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = trim(col(textCol))
    val words = split(t, "\\s+")
    val stopLit = array(Chunking.stopwords.map(lit): _*)
    docs
      .withColumn("n_chars", length(t))
      .withColumn("n_words", size(words))
      .withColumn("avg_word_len",
        round((length(t) - (size(words) - 1)).cast("double") / size(words), 4))
      .withColumn("punct_ratio",
        round((length(t) - length(regexp_replace(t, "[.,;:!?]", ""))).cast("double")
          / greatest(length(t), lit(1)), 4))
      .withColumn("stopword_ratio",
        round(size(filter(split(lower(t), "\\s+"), w => array_contains(stopLit, w)))
          .cast("double") / greatest(size(words), lit(1)), 4))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation). */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = lower(trim(col(textCol)))
    docs
      .withColumn("ws_tokens", size(split(t, "\\s+")))
      .withColumn("bpe_ish_tokens", regexp_count(t, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text —
    * the engine's analogue of the reference's sha-256 content hash
    * (`ingestion_service.py:92-94`) but invariant to whitespace/case. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling polynomial (Rabin-Karp-style) fingerprint over the token
    * stream: h = fold(h·B + hash(tok) mod p). Order-sensitive — unlike
    * [[fingerprint]], transposed tokens change it — and incremental: the
    * hash of a concatenation is computable from the parts (h(ab) =
    * h(a)·B^|b| + h(b)), which is what makes it the standard primitive
    * for content-defined chunking and shingle windows. Codegen'd
    * higher-order fold; the zero seed makes the Spark `aggregate` and
    * DuckDB `list_reduce` (no-seed) formulations identical. */
  def rollingFingerprint(text: Column, base: Long = 1000003L,
                         p: Long = 1000000007L): Column = {
    val hashes = transform(split(lower(trim(text)), "\\s+"),
      t => pmod(Dedup.md5Hash60(t), lit(p)))
    aggregate(hashes, lit(0L), (h, x) => pmod(h * base + x, lit(p)))
  }
}
