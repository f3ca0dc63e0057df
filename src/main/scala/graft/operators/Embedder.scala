package graft.operators

import org.apache.spark.sql.DataFrame

/** The pluggable-encoder boundary (SURVEY §2.4; reference
  * `embedding_generator.py:113-167`, where the sentence-transformer is
  * injected behind `get_embedding_generator()`): an [[Embedder]] fits
  * corpus-level state once (IDF statistics here; a model checkpoint in a
  * real deployment) and yields an [[EmbedderModel]] whose `embed` maps the
  * fit-time text column to a fixed-dimension unit-norm `ARRAY<FLOAT>`.
  *
  * The contract every implementation must keep, because everything
  * downstream ([[Retrieval]], [[Similarity]], [[Dedup.embeddingNearDups]])
  * assumes it:
  *   - output column is `ARRAY<FLOAT>` of exactly `dim` entries;
  *   - vectors are L2-normalized (cosine = dot product);
  *   - `embed` is a pure column transform — partition-parallel, no
  *     driver-side batching, no per-row service calls (the property that
  *     replaces the reference's lock + batch-32 + sleep loop);
  *   - queries and corpus go through the SAME fitted model (E2 == E1 on
  *     a 1-row frame).
  *
  * Swapping in a real neural encoder = one new implementation (e.g. a
  * `mapInPandas`/ONNX batch scorer); no call-site changes.
  */
trait Embedder {
  /** Output vector width. */
  def dim: Int
  /** Fit corpus-level statistics over `textCol`; the returned model binds
    * that column name. */
  def fit(corpus: DataFrame, textCol: String = "text"): EmbedderModel
}

trait EmbedderModel extends Serializable {
  /** Append `outCol ARRAY<FLOAT>` computed from the fit-time text column;
    * all other input columns pass through unchanged. */
  def embed(df: DataFrame, outCol: String = "embedding"): DataFrame
}

/** Default implementation: the deterministic MLlib
  * `RegexTokenizer → StopWordsRemover → HashingTF → IDF → Normalizer`
  * featurizer from [[Embedding]] (the zero-egress stand-in with the same
  * schema contract as the reference's 384-d sentence-transformer). */
final case class TfIdfEmbedder(dim: Int = Embedding.DefaultDim) extends Embedder {
  def fit(corpus: DataFrame, textCol: String = "text"): EmbedderModel = {
    val fitted = Embedding.fit(corpus, dim, textCol)
    new EmbedderModel {
      def embed(df: DataFrame, outCol: String = "embedding"): DataFrame =
        Embedding.embed(fitted, df, outCol)
    }
  }
}
