package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed-Dataset wrappers for the chunk folds C4/C5 (SURVEY.md §2.11
  * "Grouped-map"). C5 genuinely walks a document's chunk list in order
  * with running state (`document_processing_service.py:629-663`) — the
  * one pattern that fights Spark's unordered relational model:
  * `groupByKey(document_id)` + `flatMapGroups` with an explicit in-group
  * sort keeps it distributed (one shuffle on document_id, sequential
  * fold per document). C4's sentence packing, by contrast, is local to
  * ONE chunk (`:589-627` folds over a single chunk's sentences), so it
  * is a plain per-row `flatMap` — zero shuffle, no ordering assumption.
  */
object ChunkFolds {

  case class ChunkRow(document_id: String, position: Int, content: String)
  case class SubChunkRow(document_id: String, chunk_id: String, position: Int,
                         sub_index: Int, content: String, word_count: Int)

  /** C4 — re-split chunks larger than `maxChars` on sentence boundaries
    * (`document_processing_service.py:564-569,589-627`); chunks at or
    * under the limit pass through as sub_index 0. Emits ids
    * `{doc}_{pos}_sub_{i}` mirroring the reference's `{id}_sub_{i}`. */
  def splitLargeChunks(chunks: DataFrame, maxChars: Int = 1000,
                       idCol: String = "document_id", posCol: String = "position",
                       textCol: String = "content"): Dataset[SubChunkRow] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .selectExpr(s"cast($idCol as string) as document_id",
        s"cast($posCol as int) as position", s"$textCol as content")
      .as[ChunkRow]
      .flatMap { c =>
        val subs =
          if (c.content.length <= maxChars) Seq(c.content)
          else Chunking.packSentences(c.content, maxChars)
        subs.zipWithIndex.map { case (s, i) =>
          SubChunkRow(c.document_id, s"${c.document_id}_${c.position}_sub_$i",
            c.position, i, s, s.trim.split("\\s+").count(_.nonEmpty))
        }
      }
  }

  /** C5 — merge adjacent small chunks (< `minChars`) within a document
    * (`document_processing_service.py:629-663`), preserving order. */
  def combineSmallChunks(chunks: DataFrame, minChars: Int = 100,
                         idCol: String = "document_id", posCol: String = "position",
                         textCol: String = "content"): Dataset[SubChunkRow] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .selectExpr(s"cast($idCol as string) as document_id",
        s"cast($posCol as int) as position", s"$textCol as content")
      .as[ChunkRow]
      .groupByKey(_.document_id)
      .flatMapGroups { (doc, it) =>
        val ordered = it.toSeq.sortBy(_.position)
        Chunking.combineSmall(ordered.map(_.content), minChars).zipWithIndex.iterator
          .map { case (s, i) =>
            SubChunkRow(doc, s"${doc}_merged_$i", i, i, s,
              s.trim.split("\\s+").count(_.nonEmpty))
          }
      }
  }
}
