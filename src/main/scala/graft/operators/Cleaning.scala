package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-cleaning pass — the single decision every
  * pretraining-data pipeline ultimately emits per document: keep or
  * drop, with machine-readable reasons. Composes five independent
  * filter families (each an oracle-checked operator of its own) into
  * one plan:
  *
  *   - exact duplicate (content fingerprint, [[Dedup.exactDups]])
  *   - language whitelist ([[TextAnalysis.languageId]])
  *   - repetition ([[TextAnalysis.repetitionStats]] top-bigram share)
  *   - corpus-LM surprisal band ([[TextAnalysis.unigramSurprisal]])
  *   - benchmark contamination ([[Decontaminate.report]])
  *
  * Scale shape: each component keeps its own optimal plan (scan-only,
  * broadcast-pruned, or one keyed aggregate) and the verdict join is
  * five equi-joins on the document key — co-partitioned after the first
  * exchange, and trivially colocated if the table is bucketed by id
  * ([[graft.io.Tables.writeBucketed]]). Reasons are ordered and joined
  * to a string so the output hashes stably across engines.
  */
object Cleaning {

  def cleanCorpus(docs: DataFrame, bench: DataFrame,
                  decontamN: Int = 4,
                  langWhitelist: Seq[String] = Seq("en", "pt"),
                  maxTopBigramRatio: Double = 0.08,
                  maxSurprisal: Double = 3.5,
                  idCol: String = "doc_id"): DataFrame = {
    val dd = Dedup.exactDups(docs, idCol).select(col(idCol), col("is_duplicate"))
    val lg = TextAnalysis.languageId(docs).select(col(idCol), col("pred_lang"))
    val rp = TextAnalysis.repetitionStats(docs, idCol)
      .select(col(idCol), col("top_bigram_ratio"))
    val sp = TextAnalysis.unigramSurprisal(docs, idCol)
      .select(col(idCol), col("avg_surprisal"))
    val dc = Decontaminate.report(docs, bench, decontamN, idCol)
      .select(col("doc_id").as(idCol), col("contaminated"))
    val reasons = array_compact(array(
      when(col("is_duplicate"), "duplicate"),
      when(!col("pred_lang").isin(langWhitelist: _*), "lang"),
      when(col("top_bigram_ratio") > maxTopBigramRatio, "repetitive"),
      when(col("avg_surprisal") > maxSurprisal, "high_surprisal"),
      when(col("contaminated"), "contaminated")))
    // sp joins LEFT: a zero-token document has no surprisal row, but it
    // still needs its verdict (its 'lang' reason fires — empty text
    // scores 'und'); an inner join would silently drop it entirely
    docs.select(col(idCol))
      .join(dd, idCol).join(lg, idCol).join(rp, idCol)
      .join(sp, Seq(idCol), "left").join(dc, idCol)
      .withColumn("_r", reasons)
      .select(col(idCol),
        array_join(col("_r"), ",").as("reasons"),
        (size(col("_r")) === 0).as("keep"))
  }
}
