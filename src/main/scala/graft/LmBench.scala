package graft

import org.apache.spark.sql.SparkSession

/** Scale-rehearsal drill-down for the corpus-LM artifact split
  * (SCALING.md "third decade"): times the TRAIN half (corpus-wide gram
  * aggregate → persisted model) and the SCORE half (batch ⨝ frozen
  * model) separately, because that split is the artifact's whole point
  * — the in-line `lm_bigram` pays both every run, and at ×1000 the
  * re-explosion is the measured single-node wall. Same env knobs and
  * min-of-2 noop-sink methodology as [[QBench]].
  *
  * Usage: `runMain graft.LmBench <sfDir> <modelDir>
  * [train|score|both|clean]` — `clean` times the composed
  * `Cleaning.cleanCorpus` verdict with the unigram model frozen (the
  * other corpus-materializing ×1000 wall round 12 named).
  */
object LmBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: LmBench <sfDir> <modelDir> [train|score|both|clean]")
    val (sfDir, modelDir) = (args(0), args(1))
    val mode = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextAnalysis
    def docs = graft.io.Tables.documents(spark, sfDir)
    if (mode == "train" || mode == "both") {
      val t0 = System.nanoTime()
      TextAnalysis.saveLm(TextAnalysis.trainBigramLm(docs), modelDir)
      println(f"LMBENCH train_bigram ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    if (mode == "score" || mode == "both") {
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        TextAnalysis.bigramSurprisalWith(docs,
            TextAnalysis.loadLm(spark, modelDir, Seq("bigram", "c12", "cctx", "v")))
          .write.mode("overwrite").format("noop").save()
        println(f"LMBENCH rep$rep score_bigram ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    if (mode == "clean") {
      import org.apache.spark.sql.functions.col
      val t0 = System.nanoTime()
      TextAnalysis.saveLm(TextAnalysis.trainUnigramLm(docs), modelDir)
      println(f"LMBENCH train_unigram ${(System.nanoTime() - t0) / 1e9}%.3f s")
      for (rep <- 1 to 2) {
        val t1 = System.nanoTime()
        val bench = docs.filter(col("doc_id") % 25 === 0)
          .select(col("doc_id").as("bench_id"), col("text"))
        graft.operators.Cleaning.cleanCorpus(docs, bench,
            lm = Some(TextAnalysis.loadLm(spark, modelDir, Seq("term", "cnt", "total"))))
          .write.mode("overwrite").format("noop").save()
        println(f"LMBENCH rep$rep clean_frozen_lm ${(System.nanoTime() - t1) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
