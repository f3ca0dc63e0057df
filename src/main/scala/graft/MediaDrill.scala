package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MediaCodec

/** Decade ladder for the perceptual media-dedup tier — the two costs a
  * 100 TB media corpus pays: (1) DECODE+hash (per-row mapPartitions,
  * the linear term — report MB/s per node-equivalent) and (2) the
  * banded PAIR JOIN (the term that goes quadratic in a degenerate
  * bucket without the keeper cap — report pairs/s, capped vs uncapped,
  * plus the executed join flavor so the AQE broadcast→SMJ flip is an
  * observed fact, the [[AqeProbe]] discipline).
  *
  * The join ladder runs over SYNTHETIC hash tables (docs `d0000001…`,
  * a `hostileFrac` share all hashing to the degenerate value 0 — the
  * spacer-GIF / black-frame / silence class — and the rest xxhash64-
  * distinct), because at 10⁵–10⁶ docs it is the JOIN mechanics under
  * test, not the decoder; the decode leg measures the real codecs on
  * real bytes at a fixed count. Env knobs: `MEDIA_JOIN_DOCS` (base
  * 10 000; invoke at N, 10N, 100N for the ladder), `MEDIA_HOSTILE_PCT`
  * (default 1 — percent of docs in the degenerate bucket),
  * `MEDIA_DECODE_DOCS` (default 2 000), `MEDIA_SKIP_UNCAPPED` (set at
  * the rung where the quadratic leg stops being worth the wait — the
  * point of the exercise is that the CAPPED column keeps scaling). */
object MediaDrill {
  def main(args: Array[String]): Unit = {
    val joinDocs = sys.env.getOrElse("MEDIA_JOIN_DOCS", "10000").toLong
    val hostilePct = sys.env.getOrElse("MEDIA_HOSTILE_PCT", "1").toInt
    val decodeDocs = sys.env.getOrElse("MEDIA_DECODE_DOCS", "2000").toInt
    val skipUncapped = sys.env.contains("MEDIA_SKIP_UNCAPPED")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    /** Run to count + finalized-plan join flavors (one execution). */
    def runJoin(df: DataFrame): (Long, Double, String) = {
      val qe = df.queryExecution
      val (_, s) = timed(qe.toRdd.foreachPartition(_ => ()))
      val n = df.count() // cheap second pass relative to the join; count only
      val p = qe.executedPlan.toString.split("== Initial Plan ==")(0)
      def c(x: String) = x.r.findAllIn(p).size
      (n, s, s"smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")} " +
        s"shj=${c("ShuffledHashJoin")}")
    }

    // ---- pair-join ladder over synthetic hash tables --------------------
    val m = math.max(2L, joinDocs * hostilePct / 100) // degenerate bucket size
    val hashes = spark.range(joinDocs)
      .select(format_string("d%08d", col("id")).as("doc"),
        when(col("id") < m, lit(0L)).otherwise(xxhash64(col("id"))).as("dhash"))
      .localCheckpoint()
    val banded = MediaCodec.imageBanded(hashes).localCheckpoint()
    for (rep <- 1 to 2) {
      val (nCap, sCap, flavCap) = runJoin(MediaCodec.imagePairTail(
        MediaCodec.cappedSources(banded, Seq("band", "bucket"), 64), banded, 3))
      println(f"MEDIADRILL image_join capped rep$rep docs=$joinDocs hostile=$m " +
        f"$sCap%.2f s pairs=$nCap ${nCap / sCap}%.0f pairs/s [$flavCap]")
      if (!skipUncapped) {
        val (nUn, sUn, flavUn) = runJoin(
          MediaCodec.imagePairTail(banded, banded, 3))
        println(f"MEDIADRILL image_join uncapped rep$rep docs=$joinDocs hostile=$m " +
          f"$sUn%.2f s pairs=$nUn ${nUn / sUn}%.0f pairs/s [$flavUn]")
      }
    }
    // audio: exact-equality join on (fingerprint, n_windows) — same
    // degenerate-value shape (silence => fp 0), same keeper rule
    val fps = spark.range(joinDocs)
      .select(format_string("d%08d", col("id")).as("doc"),
        lit(8).as("n_windows"),
        when(col("id") < m, lit(0L)).otherwise(xxhash64(col("id"))).as("fingerprint"))
      .localCheckpoint()
    for (rep <- 1 to 2) {
      val (nCap, sCap, flavCap) = runJoin(MediaCodec.audioNearDupTail(
        MediaCodec.cappedSources(fps, Seq("fingerprint", "n_windows"), 64), fps))
      println(f"MEDIADRILL audio_join capped rep$rep docs=$joinDocs hostile=$m " +
        f"$sCap%.2f s pairs=$nCap ${nCap / sCap}%.0f pairs/s [$flavCap]")
      if (!skipUncapped) {
        val (nUn, sUn, flavUn) = runJoin(MediaCodec.audioNearDupTail(fps, fps))
        println(f"MEDIADRILL audio_join uncapped rep$rep docs=$joinDocs hostile=$m " +
          f"$sUn%.2f s pairs=$nUn ${nUn / sUn}%.0f pairs/s [$flavUn]")
      }
    }
    // video: per-doc (unique frame hash + shared black-frame hash 0)
    val vh = spark.range(joinDocs).select(
        format_string("d%08d", col("id")).as("doc"), xxhash64(col("id")).as("dhash"))
      .unionByName(spark.range(math.min(joinDocs, m * 50)).select(
        format_string("d%08d", col("id")).as("doc"), lit(0L).as("dhash")))
      .localCheckpoint()
    for (rep <- 1 to 2) {
      val (nCap, sCap, flavCap) = runJoin(MediaCodec.videoSharedTail(vh,
        Some(MediaCodec.cappedSources(vh, Seq("dhash"), 64))))
      println(f"MEDIADRILL video_join capped rep$rep docs=$joinDocs " +
        f"shared=${math.min(joinDocs, m * 50)} " +
        f"$sCap%.2f s pairs=$nCap ${nCap / sCap}%.0f pairs/s [$flavCap]")
    }

    // ---- decode ladder over real codec bytes ----------------------------
    val imgs = spark.range(decodeDocs)
      .mapPartitions(_.map(i => (s"img$i", "image", "bmp",
        MediaCodec.bmpBytes(96 + (i % 7).toInt, 64 + (i % 5).toInt))))
      .toDF("doc", "modality", "codec", "payload").localCheckpoint()
    val imgBytes = imgs.agg(sum(length(col("payload")))).head().getLong(0)
    val wavs = spark.range(decodeDocs)
      .mapPartitions(_.map(i => (s"wav$i", "audio", "wav",
        MediaCodec.wavBytes(8000, 1, 4000 + (i % 11).toInt))))
      .toDF("doc", "modality", "codec", "payload").localCheckpoint()
    val wavBytesN = wavs.agg(sum(length(col("payload")))).head().getLong(0)
    val avis = spark.range(decodeDocs / 4)
      .mapPartitions(_.map(i => (s"avi$i", "video", "avi",
        MediaCodec.aviBytes(48, 32, 12))))
      .toDF("doc", "modality", "codec", "payload").localCheckpoint()
    val aviBytesN = avis.agg(sum(length(col("payload")))).head().getLong(0)
    for (rep <- 1 to 2) {
      val (_, sI) = timed(MediaCodec.imageDHash(imgs).toDF()
        .write.mode("overwrite").format("noop").save())
      val (_, sW) = timed(MediaCodec.wavFingerprint(wavs).toDF()
        .write.mode("overwrite").format("noop").save())
      val (_, sV) = timed(MediaCodec.aviFrameDHash(avis).toDF()
        .write.mode("overwrite").format("noop").save())
      println(f"MEDIADRILL decode rep$rep img=${imgBytes / sI / 1e6}%.0f MB/s " +
        f"(${decodeDocs / sI}%.0f img/s) wav=${wavBytesN / sW / 1e6}%.0f MB/s " +
        f"avi=${aviBytesN / sV / 1e6}%.0f MB/s")
    }
    spark.stop()
  }
}
