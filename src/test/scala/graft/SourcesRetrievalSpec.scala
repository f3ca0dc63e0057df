package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.io.Tables
import graft.streaming.StreamingIngest

class SourcesRetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("JSON and CSV document sources yield the same rows as the schema contract") {
    val dir = Files.createTempDirectory("graft_srcs").toString
    Files.write(Paths.get(dir, "d.json"),
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "j", "n_chars": 10}
        |{"doc_id": 2, "text": "gamma", "lang": "de", "source": "j", "n_chars": 5}
        |""".stripMargin.getBytes("UTF-8"))
    val csvDir = Files.createTempDirectory("graft_csv").toString
    Files.write(Paths.get(csvDir, "d.csv"),
      "doc_id,text,lang,source,n_chars\n1,\"alpha beta\",en,c,10\n2,gamma,de,c,5\n"
        .getBytes("UTF-8"))
    val j = Tables.documentsFromJson(spark, dir)
      .select("doc_id", "text", "lang", "n_chars").orderBy("doc_id").collect()
    val c = Tables.documentsFromCsv(spark, csvDir)
      .select("doc_id", "text", "lang", "n_chars").orderBy("doc_id").collect()
    assert(j.map(_.toSeq).toSeq === c.map(_.toSeq).toSeq)
    assert(j.head.getAs[String]("text") === "alpha beta")
  }

  test("streaming retrieval answers each micro-batch of questions over the static index") {
    implicit val sqlCtx = spark.sqlContext
    val index = Seq((10L, Seq(1f, 0f)), (11L, Seq(0f, 1f)), (12L, Seq(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
    val input = MemoryStream[(Long, Seq[Float])]
    val questions = input.toDF()
      .selectExpr("_1 AS q_vec_id", "CAST(_2 AS ARRAY<FLOAT>) AS q_embedding")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val q = StreamingIngest.streamingRetrieval(questions, index, k = 2,
      batch => got.synchronized {
        got ++= batch.collect().map(r =>
          (r.getAs[Long]("q_vec_id"), r.getAs[Long]("vec_id"), r.getAs[Int]("rank")))
      }).start()
    try {
      input.addData((100L, Seq(1f, 0f)))
      q.processAllAvailable()
      input.addData((101L, Seq(0f, 1f)))
      q.processAllAvailable()
      val byQ = got.groupBy(_._1)
      // q100 nearest: vec 10 (identical) then 12; q101 nearest: vec 11
      assert(byQ(100L).sortBy(_._3).map(_._2).toSeq === Seq(10L, 12L))
      assert(byQ(101L).sortBy(_._3).map(_._2).head === 11L)
    } finally q.stop()
  }
}
