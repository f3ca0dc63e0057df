package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade ladder for the WARC WRITE side ([[graft.operators.Warc
  * .toWarcShards]]) — the half a 100 TB archive job spends its time in
  * (per-member SHA-256 + gzip are CPU-heavy): generate N distinct
  * fetched pages, then time the shard build to a noop sink for BOTH
  * framings (plain `.warc` and per-member `.warc.gz` — the CommonCrawl
  * splittable form), reporting pages/s and payload MB/s. Invoked at
  * PAGES, 10×PAGES, 100×PAGES this gives SCALING.md's write-side
  * ladder rows; the read side already has its ladder (CrawlWarcDrill).
  *
  * Shard count stays fixed at 32 (one per core) across rungs, so the
  * decade slope measures per-shard byte growth — the production shape,
  * where a bigger crawl means BIGGER shards until the ~1 GB target,
  * then more shards. `WARC_WRITE_PAGES` overrides the base page count
  * (default 5 000); `WARC_WRITE_REPEAT` repeats the ~1 KB template
  * body N× per page — the fixture page is far smaller than the ~60 KB
  * web median, so the repeat rung separates per-RECORD overhead from
  * per-BYTE throughput (the number a 100 TB estimate actually needs).
  */
object WarcWriteDrill {
  def main(args: Array[String]): Unit = {
    val pages = sys.env.getOrElse("WARC_WRITE_PAGES", "5000").toInt
    val repeat = sys.env.getOrElse("WARC_WRITE_REPEAT", "1").toInt
    val nShards = 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val template = graft.operators.DocFixtures.blogHtml
    // distinct stamped pages: nothing constant-folds or dedups away
    val df = spark.range(pages.toLong)
      .mapPartitions(_.map { i =>
        val page = template.replace("Parsing at scale", s"Parsing at scale $i")
        (s"http://example.com/p$i", "text/html; charset=utf-8",
          (page * repeat).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      })
      .toDF("url", "content_type", "content")
      .localCheckpoint() // materialize inputs: time the WRITE, not the gen
    val bytes = df.agg(sum(length(col("content")))).head().getLong(0)
    for (gz <- Seq(false, true); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.operators.Warc.toWarcShards(df, nShards, gzipMembers = gz)
        .write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      val framing = if (gz) "gz" else "plain"
      println(f"WARCWRITEDRILL $framing rep$rep pages=$pages shards=$nShards " +
        f"${s}%.2f s ${pages / s}%.0f pages/s ${bytes / s / 1e6}%.1f MB/s")
    }
    // the WET side (conversion records over extracted text) — same
    // one-shuffle url-sorted shard shape, text members instead of
    // response members; the drill pins whether it keeps WARC's
    // throughput story (it should: same digest+frame kernel, minus
    // the HTTP header block per member)
    val textDf = df.select(col("url"),
        decode(col("content"), "UTF-8").as("text"))
      .localCheckpoint()
    val textBytes = textDf.agg(sum(length(col("text")))).head().getLong(0)
    for (gz <- Seq(false, true); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.operators.Warc.toWetShards(textDf, nShards, gzipMembers = gz)
        .write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      val framing = if (gz) "gz" else "plain"
      println(f"WETWRITEDRILL $framing rep$rep pages=$pages shards=$nShards " +
        f"${s}%.2f s ${pages / s}%.0f pages/s ${textBytes / s / 1e6}%.1f MB/s")
    }
    spark.stop()
  }
}
