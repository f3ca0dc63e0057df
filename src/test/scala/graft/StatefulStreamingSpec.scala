package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.{FpDoc, FpDecision}

class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState dedup tags first arrival new, later ones dup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FpDoc]
    val q = StreamingIngest.statefulDedup(input.toDS())
      .writeStream.format("memory").queryName("fp_decisions")
      .outputMode("append").start()
    try {
      input.addData(FpDoc("fpA", 1L, 100L), FpDoc("fpA", 2L, 200L), FpDoc("fpB", 3L, 100L))
      q.processAllAvailable()
      // second micro-batch: state must remember fpA's keeper
      input.addData(FpDoc("fpA", 4L, 300L), FpDoc("fpC", 5L, 300L))
      q.processAllAvailable()
      val out = spark.table("fp_decisions").as[FpDecision].collect()
        .sortBy(_.doc_id)
      assert(out.map(d => (d.doc_id, d.is_new, d.dup_of)).toSeq === Seq(
        (1L, true, -1L),   // first fpA
        (2L, false, 1L),   // same batch dup
        (3L, true, -1L),   // first fpB
        (4L, false, 1L),   // cross-batch dup: state survived
        (5L, true, -1L)))
    } finally q.stop()
  }

  test("binaryFile scan + MIME sniff over real bytes (S3 coverage)") {
    import org.apache.spark.sql.functions._
    import graft.operators.Validation
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.pdf"),
      "%PDF-1.4 content %%EOF".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.bin"),
      Array[Byte](0x50, 0x4b, 0x03, 0x04) ++ " word/doc".getBytes("UTF-8"))
    val scanned = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"),
        Validation.sniffMime(col("content").cast("string")).as("mime"))
      .orderBy("path").collect()
    assert(scanned.length === 2)
    assert(scanned.map(_.getAs[String]("mime")).toSeq ===
      Seq("application/pdf",
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document"))
  }
}
