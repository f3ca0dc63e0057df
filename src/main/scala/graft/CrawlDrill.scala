package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput drill for the crawl-extraction tier (round 15): generate
  * N distinct synthetic pages (the blog fixture with per-page id
  * stamps, so nothing dedups away), run [[graft.operators.Html]]
  * extraction to a noop sink, and report pages/s and MB/s — the
  * numbers that say whether the per-row kernel would keep a 100 TB
  * WARC scan CPU-bound or starve it. Kept in-repo so SCALING.md's
  * throughput row is reproducible (the IvfDrill pattern).
  *
  * `CRAWL_DRILL_PAGES` overrides the page count (default 50 000).
  */
/** Decade ladder for the WARC leg of the crawl chain: generate SHARDS
  * synthetic `.warc` shards of 25 response records each (distinct
  * stamped pages — nothing constant-folds or dedups away), then time
  * [[graft.operators.Warc.warcHtmlBlocks]] to a noop sink. Invoked at
  * SHARDS, 10×SHARDS, 100×SHARDS this gives the measured ×10/×100
  * wall-clock rows SCALING.md's crawl section was missing (the plan
  * audit already shows zero shuffles; this pins the wall-clock slope).
  *
  * `CRAWL_WARC_SHARDS` overrides the shard count (default 2 000 →
  * 50 000 pages, the CrawlDrill base size).
  */
object CrawlWarcDrill {
  /** One synthetic WARC shard: 25 response records, each a distinct
    * page (ids `shard*25 .. shard*25+24` stamped into the body). Same
    * ISO 28500 framing as the fixture builder — version line, headers,
    * Content-Length, CRLF CRLF separators. */
  private[graft] def warcShard(shard: Long, perShard: Int, template: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(perShard * (template.length + 256))
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    var k = 0
    while (k < perShard) {
      val id = shard * perShard + k
      val page = template.replace("Parsing at scale", s"Parsing at scale $id")
      val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
        page).getBytes(iso)
      val hdr = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: http://example.com/p$id\r\n" +
        s"WARC-Record-ID: <urn:uuid:$id>\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes(iso)
      out.write(hdr); out.write(http); out.write("\r\n\r\n".getBytes(iso))
      k += 1
    }
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val shards = sys.env.getOrElse("CRAWL_WARC_SHARDS", "2000").toInt
    val perShard = 25
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val template = graft.operators.DocFixtures.blogHtml
    val df = spark.range(shards.toLong)
      .mapPartitions(_.map(s => (s.toString, warcShard(s, perShard, template))))
      .toDF("warc", "content")
      .localCheckpoint() // materialize inputs: time the PARSE, not the gen
    val bytes = df.agg(sum(length(col("content")))).head().getLong(0)
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.operators.Warc.warcHtmlBlocks(df)
        .write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"CRAWLWARCDRILL rep$rep shards=$shards pages=${shards * perShard} " +
        f"${s}%.2f s ${shards.toLong * perShard / s}%.0f pages/s ${bytes / s / 1e6}%.1f MB/s")
    }
    spark.stop()
  }
}

object CrawlDrill {
  def main(args: Array[String]): Unit = {
    val pages = sys.env.getOrElse("CRAWL_DRILL_PAGES", "50000").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val template = graft.operators.DocFixtures.blogHtml
    // per-page distinct bytes: stamp the id into the title and body so
    // codegen can't constant-fold and dedup can't collapse the work
    val df = spark.range(pages.toLong)
      .select(col("id").cast("string").as("doc"),
        encode(concat(
          lit(template.replace("Parsing at scale", "Parsing at scale ")),
          col("id").cast("string")), "UTF-8").as("content"))
      .localCheckpoint() // materialize inputs: time the PARSE, not the gen
    val bytes = df.agg(sum(length(col("content")))).head().getLong(0)
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.operators.Html.htmlBlocks(df)
        .write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"CRAWLDRILL rep$rep pages=$pages ${s}%.2f s " +
        f"${pages / s}%.0f pages/s ${bytes / s / 1e6}%.1f MB/s")
    }
    spark.stop()
  }
}
