package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.operators.{Embedder, EmbedderModel, Embedding, Retrieval, TfIdfEmbedder}

/** The pluggable-encoder boundary: the default implementation must be
  * byte-identical to the direct MLlib featurizer, and a swapped-in mock
  * must drive the downstream retrieval chain unchanged — proving the
  * seam is where a real neural encoder would plug in. */
class EmbedderSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def corpus: DataFrame =
    graft.io.Tables.documents(spark, d).select(col("doc_id"), col("text")).limit(50)

  test("TfIdfEmbedder through the seam equals Embedding.fit/embed directly") {
    val viaSeam = TfIdfEmbedder(dim = 64).fit(corpus).embed(corpus)
      .select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val direct0 = Embedding.embed(Embedding.fit(corpus, dim = 64), corpus)
    val direct = direct0.select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(viaSeam.keySet == direct.keySet)
    viaSeam.foreach { case (id, v) => assert(v == direct(id)) }
  }

  test("seam contract: ARRAY<FLOAT> of dim entries, unit-norm, passthrough columns") {
    val out = TfIdfEmbedder(dim = 32).fit(corpus).embed(corpus, outCol = "vec")
    assert(out.schema("vec").dataType == ArrayType(FloatType, containsNull = false))
    assert(out.columns.contains("doc_id") && out.columns.contains("text"))
    val norms = out.select(aggregate(col("vec"), lit(0.0d),
      (acc, x) => acc + x * x).as("n2")).collect().map(_.getDouble(0))
    norms.foreach(n2 => assert(n2 == 0.0 || math.abs(n2 - 1.0) < 1e-5))
    assert(out.select(size(col("vec"))).distinct().collect().map(_.getInt(0)).toSet == Set(32))
  }

  /** Deterministic stand-in for a neural encoder: char-class histogram,
    * L2-normalized — corpus-state-free, so fit is a no-op. */
  private object MockEmbedder extends Embedder {
    val dim = 4
    def fit(c: DataFrame, textCol: String): EmbedderModel = new EmbedderModel {
      def embed(df: DataFrame, outCol: String): DataFrame = {
        val counts = array(
          length(regexp_replace(col(textCol), "[^a-z]", "")),
          length(regexp_replace(col(textCol), "[^A-Z]", "")),
          length(regexp_replace(col(textCol), "[^0-9]", "")),
          length(regexp_replace(col(textCol), "[a-zA-Z0-9]", "")))
        val n = sqrt(aggregate(counts, lit(0.0d), (a, x) => a + x * x))
        df.withColumn(outCol,
          transform(counts, x => (x / n).cast("float")))
      }
    }
  }

  test("mock swap: a different Embedder drives the same retrieval chain") {
    val model = MockEmbedder.fit(corpus, "text")
    val index = model.embed(corpus, "embedding")
    val qs = model.embed(corpus.limit(3), "embedding")
      .select(col("doc_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val out = Retrieval.knnCosine(qs, index, k = 5,
      idCol = "doc_id", vecCol = "embedding")
    assert(out.columns.toSeq == Seq("q_vec_id", "doc_id", "score", "rank"))
    val byQ = out.collect().groupBy(_.getLong(0))
    assert(byQ.size == 3 && byQ.values.forall(_.length == 5))
    // the self-match guarantees a perfect top score (unit-norm mock
    // vectors; identity of the top row can tie with an identical histogram)
    byQ.foreach { case (_, rows) =>
      val top = rows.minBy(_.getInt(3))
      assert(math.abs(top.getDouble(2) - 1.0) < 1e-4)
    }
  }
}
