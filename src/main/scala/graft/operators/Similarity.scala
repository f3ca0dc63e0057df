package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Similarity search over an embedding column (`ARRAY<FLOAT>`):
  * brute-force cosine top-k as the exactness baseline, and a
  * sign-LSH-bucketed variant as the scale path (the axis-aligned
  * random-hyperplane family — deterministic, engine-reproducible). An IVF
  * variant (KMeans coarse quantizer) rides on MLlib at the ANN tier.
  *
  * The reference delegates all of this to Pinecone
  * (`pinecone_manager.py:105-138`); here the index is a parquet table and
  * kNN is a query plan (SURVEY.md §2.5/§4.3).
  */
object Similarity {

  /** Brute-force cosine top-k: queries ⨯ candidates (broadcast the query
    * side), score, rank-limit per query. WindowGroupLimit keeps per-task
    * top-k before the shuffle → O(k·|queries|) rows move. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     qidCol: String = "q_vec_id", qvecCol: String = "q_embedding",
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    Retrieval.knnCosine(queries, candidates, k, qidCol, qvecCol, idCol, vecCol)

  /** Sign-LSH bucket id: the concatenated signs of the first `dims`
    * components — hashing by axis-aligned hyperplanes through the origin.
    * Deterministic (no RNG) so any engine computes the same buckets. */
  def signBucket(vec: Column, dims: Int): Column =
    concat_ws("", (0 until dims).map(i =>
      when(element_at(VectorOps.asDouble(vec), i + 1) >= 0, "1").otherwise("0")): _*)

  /** LSH-bucketed approximate top-k: only candidates in the query's
    * bucket are scored. With `dims` hyperplanes the candidate set shrinks
    * ~2^dims-fold; recall loss is the standard LSH tradeoff (multi-probe =
    * union over several `dims` values if needed). */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int, dims: Int = 4,
              qidCol: String = "q_vec_id", qvecCol: String = "q_embedding",
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qb = broadcast(queries.withColumn("bucket", signBucket(col(qvecCol), dims)))
    val cb = candidates.withColumn("bucket", signBucket(col(vecCol), dims))
    val scored = qb.join(cb, "bucket")
      .withColumn("score", round(VectorOps.cosine(col(qvecCol), col(vecCol)), 4))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("score"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k — the classic ANN scale path:
    * a KMeans coarse quantizer (`nlist` centroids, fixed seed) partitions
    * the candidate set; each query probes only its `nprobe` nearest
    * cells. The candidate side is scanned once to assign cells (and the
    * assignment would be precomputed/persisted in a real index build);
    * the probe join is an equi-join on cell id — distributable, no
    * all-pairs scan. Recall/latency tradeoff is nprobe/nlist, exactly as
    * in FAISS-style IVF. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
              qidCol: String = "q_vec_id", qvecCol: String = "q_embedding",
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    // NOTE: no explicit persist — KMeans caches its training RDD
    // internally; an outer persist measured ~2× slower end-to-end.
    val cand = candidates.withColumn("_v", array_to_vector(col(vecCol).cast("array<double>")))
    val km = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("_v")
      .setPredictionCol("cell").setMaxIter(5) // coarse cells: convergence not needed
    val model = km.fit(cand)
    val assigned = model.transform(cand).drop("_v")
    // centroid table is nlist rows — broadcast side of the probe ranking
    val spark = candidates.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
    val probes = broadcast(queries).join(broadcast(centroids))
      .withColumn("c_score", graft.functions.VectorOps.cosineNative(col(qvecCol), col("centroid")))
    val wProbe = Window.partitionBy(col(qidCol)).orderBy(col("c_score").desc, col("cell"))
    val probeCells = probes.withColumn("p_rank", row_number().over(wProbe))
      .filter(col("p_rank") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("cell"))
    val scored = broadcast(probeCells).join(assigned, "cell")
      .withColumn("score", round(graft.functions.VectorOps.cosineNative(col(qvecCol), col(vecCol)), 4))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("score"), col("rank"))
  }
}
