package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Retrieval, Validation}

class HybridSaltedSpec extends SparkSpec {
  import spark.implicits._

  test("Q3 hybrid prefers vector results, falls back per-question") {
    val vector = Seq((0, 10L, 0.9, 1), (1, 11L, 0.8, 1))
      .toDF("question_id", "doc_id", "score", "rank")
    val keyword = Seq((0, 99L, 0.5, 1), (2, 12L, 0.4, 1))
      .toDF("question_id", "doc_id", "score", "rank")
    val out = Retrieval.hybridSearch(vector, keyword).orderBy("question_id").collect()
    // q0: vector wins (keyword row dropped); q1: vector; q2: keyword fallback
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getString(4))).toSeq ===
      Seq((0, 10L, "vector"), (1, 11L, "vector"), (2, 12L, "keyword")))
  }

  test("salted two-phase aggregation equals the direct groupBy") {
    val df = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toLong))
      .toDF("key", "v")
    val salted = Relational.saltedCountSum(df, "key", "v", saltBuckets = 8)
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = df.groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq === direct.toSeq)
  }

  test("observe counters ride the job without a second pass") {
    val docs = Seq((1L, "good text", "en", 9L), (2L, "", "en", 0L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val validated = Validation.validate(docs, maxChars = 500, langWhitelist = Seq("en"))
    val observed = Validation.withUsageCounters(validated)
    observed.collect() // any action materializes the metrics
    val m = observed.queryExecution.observedMetrics("ingest_metrics")
    assert(m.getAs[Long]("total") === 2L)
    assert(m.getAs[Long]("valid") === 1L)
    assert(m.getAs[Long]("chars_processed") === 9L)
  }
}
