package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for the training-data tier: flag training
  * documents that share word n-grams with an evaluation/benchmark set —
  * the standard leakage guard run before an LLM training job (13-gram
  * overlap in published pipelines; `n` is a parameter here).
  *
  * Scale shape: the benchmark side is small by nature (eval sets are
  * thousands of items, the corpus is 100 TB), so its exploded n-gram
  * index is BROADCAST — the corpus side streams through a map-side hash
  * join with no shuffle of document data at all; the only exchange is
  * the per-document aggregation of hit counts, which is O(hits), not
  * O(corpus). No inverted-index self-join, no skew: hot n-grams cost
  * hash-probe time, never a repartition.
  */
object Decontaminate {

  /** (doc, bench, n_shared) for every document/benchmark-item pair that
    * shares at least one distinct word `n`-gram. Both sides' shingle
    * sets are distinct per id (see [[Dedup.shinglesFromWords]]), so the
    * join emits one row per shared shingle and `count(*)` is the
    * overlap cardinality. */
  def overlapPairs(docs: DataFrame, bench: DataFrame, n: Int = 13,
                   idCol: String = "doc_id", textCol: String = "text",
                   benchIdCol: String = "bench_id",
                   benchTextCol: String = "text"): DataFrame = {
    def exploded(df: DataFrame, id: String, text: String, outId: String) =
      df.withColumn("_words", split(lower(trim(col(text))), "\\s+"))
        .select(col(id).as(outId),
          explode(Dedup.shinglesFromWords(col("_words"), n)).as("shingle"))
    exploded(docs, idCol, textCol, "doc_id")
      .join(broadcast(exploded(bench, benchIdCol, benchTextCol, "bench_id")), "shingle")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-document contamination verdict: how many benchmark items hit,
    * total shared n-grams, and the drop flag. Clean documents appear
    * with zeros (left join back to the corpus), so the output is a
    * full-corpus annotation usable as a filter mask. */
  def report(docs: DataFrame, bench: DataFrame, n: Int = 13,
             idCol: String = "doc_id", textCol: String = "text",
             benchIdCol: String = "bench_id",
             benchTextCol: String = "text"): DataFrame = {
    val pairs = overlapPairs(docs, bench, n, idCol, textCol, benchIdCol, benchTextCol)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bench_hits"), sum(col("n_shared")).as("n_overlap"))
    // the hit list is bounded by contamination (rare by construction) —
    // broadcast it rather than sort-merge the whole corpus by id; drop
    // the hint if a pathological corpus is mostly contaminated
    docs.select(col(idCol).as("doc_id"))
      .join(broadcast(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bench_hits"), lit(0L)).as("n_bench_hits"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        coalesce(col("n_bench_hits") > 0, lit(false)).as("contaminated"))
  }
}
