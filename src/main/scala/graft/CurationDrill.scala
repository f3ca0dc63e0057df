package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage attribution for the curation_e2e spine (the GoldenDrill
  * pattern) — round 20 recomposed the flagship into CCNet's published
  * order (paragraph dedup → LM fit on deduped text → perplexity
  * terciles as a verdict reason → verdict → clip → mixture), so each
  * new stage needs its own wall-clock row next to the composed total:
  * a regression in the composed query should be attributable from the
  * artifact, not by bisection. Stages time to a noop sink, min of 2,
  * warm, on the bench SF. */
object CurationDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.io.Tables
    import graft.operators.{Cleaning, TextAnalysis}

    val docs = Tables.documents(spark, sfDir)
    val decorated = docs.select(col("doc_id"), col("lang"),
      concat(col("text"),
        lit("\n\npromo p"), (col("doc_id") % 7).cast("string"),
        lit(" offer of the week."),
        lit("\n\nShare and subscribe today.")).as("text"))
    def deduped = Cleaning.paragraphDedup(decorated)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(docs.select("doc_id", "lang"), "doc_id")

    def drill(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"CURATION $name%-16s $secs%.2f s")
    }
    drill("para_dedup")(deduped)
    // the LM + tercile stages over a MATERIALIZED deduped corpus, so
    // their rows measure the stage, not a re-run of the dedup
    val d2 = deduped.localCheckpoint()
    val lm = TextAnalysis.trainUnigramLm(d2)
    drill("lm_fit")(lm)
    drill("ppl_buckets")(TextAnalysis.assignPerplexityBuckets(d2, lm,
      TextAnalysis.perplexityThresholds(d2, lm)))
    val bench = d2.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    drill("verdict_no_ppl")(Cleaning.cleanCorpus(d2, bench,
      langWhitelist = Seq("en", "de", "fr", "es", "pt"), withGopherC4 = false))
    drill("verdict_ppl") {
      val lmv = TextAnalysis.trainUnigramLm(d2)
      Cleaning.cleanCorpus(d2, bench,
        langWhitelist = Seq("en", "de", "fr", "es", "pt"),
        withGopherC4 = false, lm = Some(lmv),
        pplBuckets = Some(TextAnalysis.assignPerplexityBuckets(d2, lmv,
          TextAnalysis.perplexityThresholds(d2, lmv))
          .select(col("doc_id"), col("bucket"))))
    }
    drill("full")(SparkEntry.queries("curation_e2e")(spark, sfDir))
    spark.stop()
  }
}
