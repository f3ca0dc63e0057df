package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage attribution for the golden_e2e spine (round-17, the
  * IvfDrill pattern): the query drifted 2.97 → 4.23 s anchor-to-anchor
  * in round 16 with zero code changes, and isolated QBench confirms
  * the new level is steady-state — so decompose the chain and time
  * each leg to a noop sink (min of 2, warm), on the bench SF. Stages:
  * chunking alone, the tf-idf cosine leg, the BM25 leg, the fused
  * chain without the final broadcast join, and the full query. */
object GoldenDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.io.Tables
    import graft.operators.{Chunking, Retrieval}
    import spark.implicits._
    val qs = Retrieval.goldenQuestions.zipWithIndex
      .map { case (q, i) => (i, q) }.toDF("question_id", "question")
    def chunks = Chunking.paragraphChunks(Tables.documents(spark, sfDir), minChars = 20)
      .select(col("chunk_id"), col("content").as("text"))
    // stage COUNT per rep alongside wall time: the chain's cost at the
    // bench SF is ~0.15 s of scheduling floor per serial AQE stage, so
    // the count is the quantity a structural change must move
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
    })
    def drill(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val (secs, n) = (1 to 2).map { _ =>
        stages.set(0)
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        // capture elapsed BEFORE the listener-drain wait: the sleep used
        // to sit inside the timed interval, inflating every row by
        // ~0.2 s against a ~0.15 s/stage floor (r20 advisory)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let the listener bus drain
        (dt, stages.get())
      }.minBy(_._1)
      println(f"GOLDEN $name%-12s $secs%.2f s  stages=$n%d")
    }
    drill("chunks")(chunks)
    drill("vector")(Retrieval.tfidfCosineSearch(qs, chunks, k = 10, idCol = "chunk_id"))
    drill("lexical")(Retrieval.bm25Search(qs, chunks, k = 10, idCol = "chunk_id"))
    drill("fused") {
      Retrieval.rrfFuse(
        Retrieval.tfidfCosineSearch(qs, chunks, k = 10, idCol = "chunk_id"),
        Retrieval.bm25Search(qs, chunks, k = 10, idCol = "chunk_id"),
        k = 3, idCol = "chunk_id")
    }
    drill("full")(SparkEntry.queries("golden_e2e")(spark, sfDir))
    spark.stop()
  }
}
