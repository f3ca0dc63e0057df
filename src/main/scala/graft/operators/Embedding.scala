package graft.operators

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer, StopWordsRemover}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E1/E2/E4 — the embedding stage (SURVEY.md §2.4). The reference runs a
  * sentence-transformer under a lock, batch 32, with inter-batch sleeps
  * (`embedding_generator.py:113-167`; model config `config.py:8-11`).
  * Zero-egress stand-in: a deterministic MLlib featurizer
  * `RegexTokenizer → StopWordsRemover → HashingTF(dim) → IDF →
  * Normalizer(L2)` producing unit-norm `ARRAY<FLOAT>` — same schema
  * contract (fixed dim, L2-normalized, cosine-ready) as the reference's
  * 384-d vectors. MLlib `transform` is partition-parallel: the lock, the
  * batching, and the sleeps all disappear (BASELINE.md implication).
  *
  * HashingTF is seedless-deterministic; IDF is fit once on the corpus and
  * reused for queries (E2 is the same pipeline on a 1-row DataFrame —
  * no special path, SURVEY §2.4).
  */
object Embedding {
  val DefaultDim = 384

  def buildPipeline(dim: Int = DefaultDim, textCol: String = "text"): Pipeline = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("_words")
      .setPattern("[a-z0-9]+").setGaps(false).setToLowercase(true)
    val stop = new StopWordsRemover()
      .setInputCol("_words").setOutputCol("_terms")
      .setStopWords(Chunking.stopwords.toArray)
    val tf = new HashingTF()
      .setInputCol("_terms").setOutputCol("_tf").setNumFeatures(dim)
    val idf = new IDF().setInputCol("_tf").setOutputCol("_tfidf")
    val norm = new Normalizer().setInputCol("_tfidf").setOutputCol("_vec").setP(2.0)
    new Pipeline().setStages(Array(tok, stop, tf, idf, norm))
  }

  /** Fit the featurizer on a corpus (IDF statistics). */
  def fit(corpus: DataFrame, dim: Int = DefaultDim, textCol: String = "text"): PipelineModel =
    buildPipeline(dim, textCol).fit(corpus)

  /** Apply a fitted featurizer; returns the input plus `outCol
    * ARRAY<FLOAT>` (unit-norm), internal columns dropped. */
  def embed(model: PipelineModel, df: DataFrame, outCol: String = "embedding"): DataFrame =
    model.transform(df)
      .withColumn(outCol, vector_to_array(col("_vec"), "float32"))
      .drop("_words", "_terms", "_tf", "_tfidf", "_vec")

  /** The TF stage of the featurizer in cross-engine-reproducible form:
    * token → md5-derived bucket in [0, dim) → per-(doc, bucket) counts.
    * (MLlib's HashingTF uses Murmur3 with Spark-private seeding, so its
    * buckets can't be recomputed by another engine; this md5 variant
    * keeps the featurizer's correctness oracle-checkable — SURVEY.md
    * §7.4 risk #1.) Integer output: no float parity issues. */
  def tfBuckets(docs: DataFrame, dim: Int = DefaultDim, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("tok"))
      .filter(!col("tok").isin(Chunking.stopwords: _*))
    toks
      .withColumn("bucket", pmod(Dedup.md5Hash60(col("tok")), lit(dim)))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
  }

  /** ±1 sign from md5 of "j:i" — the matrix entry formula shared
    * verbatim with the DuckDB oracle, so both engines build the same
    * projection matrix from nothing but md5. */
  private def md5SignRow(j: Int, n: Int): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { i =>
      val hex = md.digest(s"$j:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.take(15), 16) % 2 == 1) 1L else -1L
    }
  }

  /** Johnson-Lindenstrauss random projection to `outDim` dimensions with
    * a DETERMINISTIC ±1/√k sign matrix (Achlioptas-style), entries
    * derived from md5(j:i) — no RNG, so any engine/re-run projects
    * identically. The matrix is built driver-side (it is data-independent
    * metadata) and shipped as literals: the projection is map-side
    * per-row arithmetic, zero shuffle at any corpus size. Components go
    * through fixed-point micro-units so the 64-term sums are exact
    * integer folds (order-free) before the single float scale at the
    * end. Output in long form (vec_id, out_pos, y) — one row per
    * projected component. At 100 TB the same matrix feeds a compiled
    * GEMM kernel; the semantics stay byte-identical. */
  def randomProjection(vecs: DataFrame, inDim: Int = 64, outDim: Int = 16,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    // NO final round: the integer sum, the 1/√k factor, and the /1e6 are
    // the same IEEE ops in any engine, so y is already bit-identical —
    // while round(y, 6) would EXPOSE instability here (with k=16 the
    // values land exactly on .25/.5/.75 micro-unit boundaries, where
    // HALF_UP-on-decimal-digits and round-via-float-multiply disagree).
    val ys = (0 until outDim).map { j =>
      val w = typedLit(md5SignRow(j, inDim))
      struct(lit(j).as("out_pos"),
        (aggregate(zip_with(col("_x6"), w, (a, b) => a * b),
            lit(0L), (acc, v) => acc + v).cast("double") * lit(inv) / lit(1e6))
          .as("y"))
    }
    vecs
      // fail fast on a wrong-width vector: zip_with would null-pad it and
      // emit silent NULL projections instead of an error
      .withColumn("_x6", when(size(col(vecCol)) === inDim,
        transform(col(vecCol), v => round(v.cast("double") * 1e6, 0).cast("long")))
        .otherwise(raise_error(concat(
          lit(s"randomProjection: expected $inDim-dim vector, got "),
          size(col(vecCol)).cast("string")))))
      .select(col(idCol), explode(array(ys: _*)).as("p"))
      .select(col(idCol), col("p.out_pos").as("out_pos"), col("p.y").as("y"))
  }

  /** Per-label centroid components — class prototypes for
    * nearest-centroid classification / cluster summaries over the
    * embedding table. Component values go through fixed-point micro-units
    * before the sum (double addition is order-dependent; long addition is
    * exact), so the result is bit-identical on any engine and any
    * partitioning. Shape: one posexplode + one hash aggregate on
    * (label, position) — the exactness-first form. Where bit-exactness
    * isn't required, MLlib `Summarizer.mean` does the same in one
    * aggregate over whole vectors (partial-combined, less shuffle
    * volume). */
  def labelCentroids(vecs: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame =
    vecs
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .withColumn("x6", round(col("x").cast("double") * 1e6, 0).cast("long"))
      .groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("x6")) / count(lit(1)) / 1e6, 6).as("mean_c"))

  /** Deterministic contrastive training triplets over a labeled embedding
    * table — the (anchor, positive, negative) generator in front of a
    * metric-learning / embedding fine-tune job. Positive = the anchor's
    * nearest same-label neighbor by rounded cosine (hard positive);
    * negative = the md5-minimal different-label row keyed on the
    * (anchor, candidate) pair — a reproducible stand-in for uniform
    * negative sampling, a different draw per anchor, identical across
    * engines and re-runs (the [[Sampling]] stance: hashes, never RNGs).
    *
    * Scale shape: anchors are the tiny side and broadcast into BOTH
    * selections. The positive join is label-equi (distributes; per-label
    * skew is the usual caveat); the negative pass is a broadcast
    * nested-loop over anchors × corpus — O(|anchors|·|corpus|) scored
    * rows that never shuffle, reduced to one row per anchor by the same
    * partial-rank window the retrieval family uses. Zero-norm vectors
    * are excluded on both sides (no cosine cell — the brpLshTopK
    * contract). */
  def contrastiveTriplets(vecs: DataFrame, nAnchors: Int = 20,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          labelCol: String = "label"): DataFrame = {
    import graft.functions.VectorOps
    import org.apache.spark.sql.expressions.Window
    val nz = vecs.filter(VectorOps.normSq(col(vecCol)) > 0)
    val anchors = broadcast(nz.filter(col(idCol) < nAnchors)
      .select(col(idCol).as("anchor_id"), col(vecCol).as("a_emb"),
        col(labelCol).as("a_label")))
    val wp = Window.partitionBy(col("anchor_id"))
      .orderBy(col("pos_score").desc, col(idCol))
    val posTop = anchors
      .join(nz, col(labelCol) === col("a_label") && col(idCol) =!= col("anchor_id"))
      .withColumn("pos_score",
        round(VectorOps.cosineNative(col("a_emb"), col(vecCol)), 4))
      .withColumn("_rn", row_number().over(wp)).filter(col("_rn") === 1)
      .select(col("anchor_id"), col(idCol).as("pos_id"), col("pos_score"))
    val wn = Window.partitionBy(col("anchor_id")).orderBy(col("_nk"), col(idCol))
    val negTop = anchors
      .join(nz, col(labelCol) =!= col("a_label"))
      .withColumn("_nk",
        Sampling.md5Bucket64k(concat_ws(":", col("anchor_id"), col(idCol))))
      .withColumn("_rn", row_number().over(wn)).filter(col("_rn") === 1)
      .select(col("anchor_id"), col(idCol).as("neg_id"))
    posTop.join(negTop, "anchor_id")
  }
}
