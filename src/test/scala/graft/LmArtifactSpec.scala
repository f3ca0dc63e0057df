package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, TextAnalysis}

/** The persisted corpus-LM lifecycle: train once → save → load → score
  * from the artifact. The artifact path must reproduce the
  * self-contained operators bit-exactly (the CORRECTNESS gate replays
  * both against the same DuckDB oracle), and a FROZEN model must score
  * new batches without touching the training corpus — the train-once
  * shape that removes the ×1000 re-explosion wall SCALING.md measured
  * for the in-line `lm_bigram`. */
class LmArtifactSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.io.Tables.documents(spark, sf)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("model").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("unigram: scoring from the saved+loaded model equals the in-line operator") {
    val dir = tmp("graft-lmu-spec")
    TextAnalysis.saveLm(TextAnalysis.trainUnigramLm(docs), dir)
    val fromArtifact = TextAnalysis.unigramSurprisalWith(docs,
      TextAnalysis.loadLm(spark, dir, Seq("term", "cnt", "total")))
    assert(rows(fromArtifact) === rows(TextAnalysis.unigramSurprisal(docs)))
  }

  test("bigram: scoring from the saved+loaded model equals the in-line operator") {
    val dir = tmp("graft-lmb-spec")
    TextAnalysis.saveLm(TextAnalysis.trainBigramLm(docs), dir)
    val fromArtifact = TextAnalysis.bigramSurprisalWith(docs,
      TextAnalysis.loadLm(spark, dir, Seq("bigram", "c12", "cctx", "v")))
    assert(rows(fromArtifact) === rows(TextAnalysis.bigramSurprisal(docs)))
  }

  test("a frozen model scores a NEW batch: in-model tokens score, unseen drop") {
    import spark.implicits._
    val train = Seq((1L, "alpha beta gamma"), (2L, "alpha beta"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.trainUnigramLm(train)
    // total=5: alpha 2, beta 2, gamma 1
    val fresh = Seq(
      (10L, "alpha gamma"),            // fully in-model
      (11L, "alpha unseen1 unseen2"),  // partial: only alpha scores
      (12L, "zzz qqq")                 // fully unseen → no row at all
    ).toDF("doc_id", "text")
    val scored = TextAnalysis.unigramSurprisalWith(fresh, model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored === Map(10L -> 2L, 11L -> 1L),
      "n_tokens must count only in-model tokens; all-unseen docs yield no row")
    // the scored values come from the FROZEN totals: ln(5/2) for alpha
    val s10 = TextAnalysis.unigramSurprisalWith(fresh, model)
      .filter(col("doc_id") === 11L).head().getDouble(2)
    assert(math.abs(s10 - BigDecimal(math.log(5.0 / 2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("loadLm rejects a wrong-schema directory with the missing columns named") {
    val dir = tmp("graft-lmx-spec")
    TextAnalysis.saveLm(TextAnalysis.trainUnigramLm(docs), dir)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.loadLm(spark, dir, Seq("bigram", "c12"))
    }
    assert(e.getMessage.contains("bigram") && e.getMessage.contains("c12"))
  }

  test("cleanCorpus with a pre-trained LM reproduces the self-trained verdict") {
    val bench = docs.filter(col("doc_id") % 25 === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val lm = TextAnalysis.trainUnigramLm(docs)
    val withLm = Cleaning.cleanCorpus(docs, bench, lm = Some(lm))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    val selfTrained = Cleaning.cleanCorpus(docs, bench)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(withLm === selfTrained)
  }
}
