package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage wall-clock drill-down of the `ivf_stream_e2e` lifecycle
  * (VERDICT r14 "What's wrong" #1): build / micro-batch 0 / micro-batch 1 /
  * compact / zombie replay / micro-batch 2 / probe, each timed separately,
  * twice, so the floor of each stage is attributable. Kept in-repo so the
  * SCALING.md numbers are reproducible.
  */
object IvfDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"IVFDRILL $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // IVF_DRILL_ENTRY=1: time the REAL SparkEntry query through the same
    // call QBench makes, to localize any gap between this drill's inlined
    // lifecycle and the benched query
    if (sys.env.contains("IVF_DRILL_ENTRY")) {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries("ivf_stream_e2e")(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        println(f"IVFDRILL entry rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      spark.stop(); return
    }
    // fixed dir ACROSS reps, like the real query's per-JVM ivfStreamDir —
    // rep 2 exercises rebuild-over-existing, the warm shape Bench times
    val fixedDir = sys.env.get("IVF_DRILL_FIXED_DIR")
      .map(_ => java.nio.file.Files.createTempDirectory("graft-ivf-drill-fixed").toString)
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val s = spark
      val e = graft.io.Tables.embeddings(s, sfDir)
      val dir = fixedDir.getOrElse(
        java.nio.file.Files.createTempDirectory("graft-ivf-drill").toString)
      t("build") { graft.io.IvfIndex.build(e.filter(col("vec_id") >= 200), dir, nlist = 8) }
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val late = t("collect") {
        e.filter(col("vec_id") >= 5 && col("vec_id") < 200)
          .select("vec_id", "embedding").collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
      }
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])]
      val q = t("start") {
        input.toDF()
          .selectExpr("_1 AS vec_id", "CAST(_2 AS ARRAY<FLOAT>) AS embedding")
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            graft.io.IvfIndex.append(b, dir, batchId = Some(id))
          }
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("graft-ivf-drill-ck").toString)
          .start()
      }
      try {
        t("batch0") { input.addData(late.filter(_._1 < 70).toSeq); q.processAllAvailable() }
        t("batch1") { input.addData(late.filter(x => x._1 >= 70 && x._1 < 135).toSeq); q.processAllAvailable() }
        t("compact") { graft.io.IvfIndex.compact(s, dir, foldMinRatio = 0.0) }
        t("replay") {
          graft.io.IvfIndex.append(
            e.filter(col("vec_id") >= 70 && col("vec_id") < 135), dir, batchId = Some(1L))
        }
        t("batch2") { input.addData(late.filter(_._1 >= 135).toSeq); q.processAllAvailable() }
      } finally t("stop") { q.stop() }
      t("probe") {
        graft.io.IvfIndex.probe(s, dir,
          e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding")),
          k = 10, nprobe = 2).write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
