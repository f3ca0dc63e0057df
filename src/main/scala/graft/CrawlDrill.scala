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
