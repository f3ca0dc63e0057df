package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained Naive-Bayes document classifier — the model-BASED filter
  * next to the heuristic quality tier ([[TextAnalysis.qualityScore]]).
  * This is the fastText/CCNet pattern large-corpus curation pipelines
  * run at the front of training-data selection: fit a cheap linear
  * classifier on weak labels (here: the corpus' own `lang` column as
  * target-language supervision), persist the model as an artifact, and
  * score every later batch against it — train once, ship everywhere,
  * like the tokenizer ([[Bpe.saveModel]]) and LM
  * ([[TextAnalysis.saveLm]]) artifacts.
  *
  * Model: multinomial NB with add-one smoothing over `[a-z]+` word
  * tokens (the lang-id tier's alphabet). The per-term log-likelihood
  * ratio folds into ONE logarithm of an integer-count cross-ratio,
  *
  *   llr(t) = ln( (pos_cnt+1)·(neg_tot+V) / ((neg_cnt+1)·(pos_tot+V)) )
  *
  * rounded to 6 decimals then scaled to integer micro-nats BEFORE the
  * per-document sum — the repo-wide fixed-point discipline (see
  * [[TextAnalysis.unigramSurprisal]]): long sums are order-free, so
  * the score is partitioning-invariant and exactly replayable.
  *
  * Scale design: training is ONE aggregation over the token scan (the
  * counts frame is vocab-bounded); scoring is a scan + one BROADCAST
  * join against the vocab-bounded model + a per-document sum — no
  * corpus-sized shuffle anywhere. The model's 5 scalar totals are
  * collected driver-side in [[nbScore]] and folded into the scoring
  * expression as literals (the MLlib fitted-parameter pattern — the
  * model row count is bounded by the vocabulary, never the corpus), so
  * the per-row arithmetic is whole-stage-codegen'd literal math.
  */
object Classify {

  private def wordsCol(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Fit the NB model: `(term, pos_cnt, neg_cnt)` token counts plus the
    * denormalized totals every row carries (`pos_tot`, `neg_tot`,
    * `vocab`, `pos_docs`, `neg_docs`) so the persisted artifact is
    * self-contained — the [[TextAnalysis.saveLm]] convention. `label`
    * is any boolean column over `docs` (default: `lang = 'en'`, the
    * target-language weak supervision CCNet-style filters start from).
    */
  def nbTrain(docs: DataFrame, label: Column = col("lang") === "en",
              textCol: String = "text"): DataFrame = {
    val labeled = docs.select(label.as("pos"), col(textCol).as("_t"))
    // counts feeds BOTH the broadcast totals and the main side —
    // unmaterialized, the corpus tokenize+explode+aggregate ran twice
    // per fit (r21; vocabulary-sized frame, the cheap thing to pin)
    val counts = Mat.point(labeled
      .select(col("pos"), explode(wordsCol(col("_t"))).as("term"))
      .groupBy("term").agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("pos_cnt"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("neg_cnt")))
    val totals = counts.agg(
      sum("pos_cnt").as("pos_tot"), sum("neg_cnt").as("neg_tot"),
      count(lit(1)).as("vocab"))
    val docTotals = labeled.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("pos_docs"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("neg_docs"))
    counts.crossJoin(broadcast(totals)).crossJoin(broadcast(docTotals))
  }

  /** Persist / load the fitted model (parquet; the artifact IS the
    * counts table — columns checked on load like [[TextAnalysis.loadLm]]). */
  def saveNb(model: DataFrame, dir: String): Unit =
    model.write.mode("overwrite").parquet(dir)

  def loadNb(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.loadLm(spark, dir,
      Seq("term", "pos_cnt", "neg_cnt", "pos_tot", "neg_tot", "vocab",
        "pos_docs", "neg_docs"))

  /** Score documents under a fitted model: `(doc_id, n_tokens, nb_llr,
    * pred)` where `nb_llr` is the prior llr plus the summed per-token
    * llr in nats (4 decimals) and `pred` = 1 iff the posterior favors
    * the positive class. Terms outside the model vocabulary take the
    * smoothed zero-count llr (left join + coalesce). Documents with no
    * `[a-z]+` token have no rows to sum and drop out — the same
    * explode-join semantics every token-scoring operator here uses. */
  def nbScore(docs: DataFrame, model: DataFrame,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val m = model.agg(
      max("pos_tot").as("pos_tot"), max("neg_tot").as("neg_tot"),
      max("vocab").as("vocab"),
      max("pos_docs").as("pos_docs"), max("neg_docs").as("neg_docs"))
      .collect()(0)
    val (posTot, negTot, v) = (m.getLong(0), m.getLong(1), m.getLong(2))
    val (posDocs, negDocs) = (m.getLong(3), m.getLong(4))
    require(posDocs > 0 && negDocs > 0,
      s"nbScore needs both classes in the model, got pos_docs=$posDocs neg_docs=$negDocs")
    // driver-side twin of the fixed-point ln discipline: exact 6-decimal
    // round then micro-nat scale, no second float round-trip
    val prior6 = (BigDecimal(math.log(posDocs.toDouble / negDocs))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP) * BigDecimal(1000000)).toLongExact
    val llr6 = round(round(log(
      ((coalesce(col("pos_cnt"), lit(0L)) + 1L).cast("double") * lit((negTot + v).toDouble)) /
        ((coalesce(col("neg_cnt"), lit(0L)) + 1L).cast("double") * lit((posTot + v).toDouble))),
      6) * 1e6, 0).cast("long")
    docs
      .select(col(idCol), explode(wordsCol(col(textCol))).as("term"))
      .join(broadcast(model.select("term", "pos_cnt", "neg_cnt")), Seq("term"), "left")
      .select(col(idCol), llr6.as("s6"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        // UNROUNDED on purpose: the micro-nat sum is an exact integer,
        // so int/1e6 is the same IEEE double everywhere — a final
        // round(_, 4) would only reintroduce the half-boundary
        // instability the fixed-point discipline removed
        ((sum("s6") + prior6).cast("double") / 1e6).as("nb_llr"),
        when(sum("s6") + prior6 > 0, 1).otherwise(0).as("pred"))
  }
}
