package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator family from SURVEY.md §2
  * (or the training-data-pipeline tier), expressed as a pure
  * `(SparkSession, sfDir) => DataFrame`; [[oracleSql]] carries the
  * DuckDB-equivalent ANSI SQL for the driver's hash compare. Column
  * names/types and value rounding are kept bit-stable across engines:
  * doubles rounded before ranking, timestamps emitted as epoch seconds.
  */
object SparkEntry extends EntryRelational with EntryRetrieval
    with EntryCuration with EntryDocs with EntryEvents with EntrySubword {

  /** Flagship query on sf=0.001 (SURVEY §7.1 minimum slice, extended):
    * documents → paragraph chunks → two retrieval strategies over the
    * same corpus — exact cosine kNN on the TF-IDF featurizer (E1
    * stand-in) and BM25 lexical ranking — fused per question by
    * reciprocal-rank fusion (score = Σ 1/(60+rank) over the lists that
    * retrieved the chunk), top-3 per golden question. One job exercises
    * scan, generator, featurize, broadcast join, two rankers, and the
    * fusion aggregate — the engine's spine end to end. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val chunks = Chunking.paragraphChunks(Tables.documents(spark, dir), minChars = 20)
    // through the pluggable-encoder seam; TfIdfEmbedder delegates to
    // Embedding.fit/embed, so results are byte-identical to calling the
    // featurizer directly
    val model = TfIdfEmbedder(dim = 384).fit(chunks.withColumnRenamed("content", "text"))
    val index = model.embed(chunks.withColumnRenamed("content", "text"))
      .select(col("chunk_id"), col("document_id"), col("text"), col("embedding"))
    val questions = Retrieval.goldenQuestions.zipWithIndex
      .map { case (q, i) => (i, q) }.toDF("q_id", "text")
    val qVecs = model.embed(questions)
      .select(col("q_id"), col("text").as("question"), col("embedding").as("q_embedding"))
    val vector = Retrieval.knnCosine(qVecs, index, k = 10,
        qidCol = "q_id", qvecCol = "q_embedding", idCol = "chunk_id")
      .select(col("q_id").as("question_id"), col("chunk_id"), col("rank"))
    val lexical = Retrieval.bm25Search(
        questions.withColumnRenamed("text", "question")
          .withColumnRenamed("q_id", "question_id"),
        chunks.withColumnRenamed("content", "text"), k = 10, idCol = "chunk_id")
      .select(col("question_id"), col("chunk_id"), col("rank"))
    val rrf = vector.withColumn("src", lit("vec"))
      .unionByName(lexical.withColumn("src", lit("bm25")))
      .groupBy(col("question_id"), col("chunk_id"))
      .agg(round(sum(lit(1.0) / (lit(60) + col("rank"))), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("question_id"))
      .orderBy(col("rrf_score").desc, col("chunk_id"))
    rrf.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .join(questions.select(col("q_id").as("question_id"),
        col("text").as("question")), "question_id")
  }

  // ---------------------------------------------------------------------
  // The registry: per-tier traits (mechanical round-16 split of the
  // former 4,400-line monolith) composed into the driver's two maps.
  // Key sets are disjoint by construction (each query was moved once);
  // iteration order of the composed HashMap depends only on the key
  // set, so the bench order is byte-identical to the monolith's.
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relationalQueries ++ retrievalQueries ++ curationQueries ++
      docsQueries ++ eventsQueries ++ subwordQueries

  def oracleSql: Map[String, String] =
    relationalOracles ++ retrievalOracles ++ curationOracles ++
      docsOracles ++ eventsOracles ++ subwordOracles
}
