package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage attribution for the crawl_corpus_e2e flagship (the
  * GoldenDrill pattern): the chain is fixture-sized (8 pages), so its
  * anchor cost is stage-scheduling floors, not data — this drill pins
  * WHICH stage owns the floor. Each leg goes to a noop sink (min of 2,
  * warm); `pages` is the chain's own eager localCheckpoint, so stages
  * downstream of it time THEIR OWN work, not a re-fetch. */
object CrawlCorpusDrill {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{CrawlCorpus, UrlIngest}
    val base = UrlIngest.crawlSiteBase
    val rules = CrawlCorpus.siteRules(base)
    val seeds = Seq(s"$base/site.html").toDF("url")
    def drill(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"CRAWLCORPUS $name%-10s $secs%.2f s")
    }
    def timed[A](name: String)(a: => A): A = {
      val t0 = System.nanoTime()
      val r = a
      println(f"CRAWLCORPUS $name%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s (once, eager)")
      r
    }
    val blocked = CrawlCorpus.blocklist(spark)
    // discover WITHOUT vs WITH the RefinedWeb URL filter — the new
    // stage's own cost is the delta (a per-row projection + the
    // broadcast blocklist join)
    drill("discover")(CrawlCorpus.discover(spark, seeds, rules))
    drill("urlfilter")(CrawlCorpus.discover(spark, seeds, rules, blocked))
    drill("frontier")(CrawlCorpus.schedule(
      CrawlCorpus.discover(spark, seeds, rules, blocked), rules))
    // fetchExtract materializes through the Mat seam (lazy by default
    // since r21) — force the build inside the timed region with a noop
    // write so this row still times the one-shot build (markdown
    // routing, NFC normalization, the CCNet host-line-dedup exchange
    // pair) and downstream rows time only their own work
    val pages = timed("extract") {
      val p = CrawlCorpus.fetchExtract(seeds, CrawlCorpus.schedule(
        CrawlCorpus.discover(spark, seeds, rules, blocked), rules))
      p.write.mode("overwrite").format("noop").save()
      p
    }
    drill("verdict")(CrawlCorpus.verdict(spark, pages))
    drill("neardup")(CrawlCorpus.nearDup(pages))
    drill("clip")(CrawlCorpus.clip(spark, pages))
    drill("corpus")(CrawlCorpus.corpus(pages,
      CrawlCorpus.verdict(spark, pages), CrawlCorpus.nearDup(pages),
      CrawlCorpus.clip(spark, pages)))
    drill("full")(CrawlCorpus.run(spark))
    spark.stop()
  }
}
