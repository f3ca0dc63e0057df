package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade ladder for the published quality-filter families (round 17):
  * generate PAGES distinct synthetic web-shaped pages (multi-line,
  * bullets, ellipses, sentences — every counter the rules touch gets
  * real work; id stamps keep constant-folding and dedup out), then
  * time [[graft.operators.TextAnalysis.gopherQuality]],
  * [[graft.operators.TextAnalysis.gopherRepetition]] and
  * [[graft.operators.Cleaning.c4Clean]] to a noop sink. These are
  * regex-heavy per-row projections (`regexp_count` ×6 per page in the
  * Gopher quality pass), so the per-row constant is what decides
  * whether a 100 TB filter pass stays CPU-bound — the ladder pins the
  * wall-clock slope the flip audit can't see. Invoked at PAGES,
  * 10×PAGES, 100×PAGES (the CrawlWarcDrill cadence); reports per-op
  * pages/s and MB/s, min of two reps.
  *
  * `QUALITY_DRILL_PAGES` overrides the page count (default 50 000).
  */
object QualityDrill {
  def main(args: Array[String]): Unit = {
    val pages = sys.env.getOrElse("QUALITY_DRILL_PAGES", "50000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ~1.1 KB/page, 12 lines: prose sentences (terminal punct, stop
    // words), two bullet lines, one ellipsis line, one repeated line,
    // one word-soup line — every rule family sees mixed verdicts
    val id = col("id").cast("string")
    val sentence = concat(lit("The crawl pipeline item "), id,
      lit(" fetches pages politely and extracts the main content with care. "),
      lit("Boilerplate removal decides corpus quality for shard "), id,
      lit(" so the extractor measures link density and that matters."))
    val page = concat(
      sentence, lit("\n"),
      lit("- a bullet entry for item "), id, lit("\n"),
      lit("- another bullet entry\n"),
      lit("to be continued...\n"),
      lit("repeated filler line\nrepeated filler line\n"),
      lit("spark filter join merge batch stream window hash scan vector\n"),
      sentence, lit(" We keep sentences that end properly and have "),
      lit("enough words to matter for statistics of page "), id, lit("."))
    val docs = spark.range(pages).select(col("id").as("doc_id"), page.as("text"))
    val bytes = pages * 1100L // ~generated page size, for the MB/s row
    def drill(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"QUALITY $name pages=$pages secs=$secs%.2f " +
        f"pages_per_s=${pages / secs}%.0f mb_per_s=${bytes / secs / 1e6}%.1f")
    }
    drill("gopher_quality")(graft.operators.TextAnalysis.gopherQuality(docs))
    drill("gopher_repetition")(graft.operators.TextAnalysis.gopherRepetition(docs))
    drill("c4_clean")(graft.operators.Cleaning.c4Clean(docs))
    // the trim ACTION next to the detectors — a doc-scoped window
    // (bounded by page size, no corpus-global key), so the ladder's
    // job is to prove the per-page constant and the flat decade slope
    drill("collapse_repeats")(graft.operators.Cleaning.collapseRepeatedLines(docs))
    spark.stop()
  }
}
