package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import graft.operators.{DocFixtures, UrlIngest}

/** S1 url ingestion — the halves the driver query can't cover: binary
  * formats (hashes checked against JVM-computed sha256), the size cap,
  * the retry/backoff loop, and the scheme guard. */
class UrlIngestSpec extends SparkSpec {
  import spark.implicits._

  private def stageAll(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft_url_spec").toFile
    DocFixtures.all.foreach { case (doc, fmt, bytes) =>
      java.nio.file.Files.write(new java.io.File(dir, s"$doc.$fmt").toPath, bytes)
    }
    dir
  }

  private def sha256Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  test("S1: binary formats ingest with correct hash, cache name, and sniffed MIME") {
    val dir = stageAll()
    try {
      val urls = Seq(s"file://$dir/policy.docx", s"file://$dir/contract.pdf")
        .toDF("url")
      val out = UrlIngest.ingest(urls).collect()
        .map(r => r.getAs[String]("url") -> r).toMap
      val docxBytes = DocFixtures.docxBytes(DocFixtures.policyParas, Seq(DocFixtures.policyTable))
      val docxRow = out(s"file://$dir/policy.docx")
      assert(docxRow.getAs[String]("file_hash") == sha256Hex(docxBytes))
      assert(docxRow.getAs[String]("mime_type") == UrlIngest.DocxMime)
      assert(docxRow.getAs[Boolean]("is_valid"))
      assert(docxRow.getAs[Long]("file_size") == docxBytes.length.toLong)
      // {md5(url)[:8]}_{sha256[:12]}{ext} (ingestion_service.py:102-106)
      assert(docxRow.getAs[String]("cache_name")
        .matches("[0-9a-f]{8}_" + sha256Hex(docxBytes).take(12) + "\\.docx"))
      val pdfRow = out(s"file://$dir/contract.pdf")
      assert(pdfRow.getAs[String]("mime_type") == "application/pdf")
      assert(pdfRow.getAs[Boolean]("is_valid"))
      assert(pdfRow.getAs[Int]("attempts") == 1)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }

  test("S1: shallow validation passes a lying %PDF body — deep parse is S10's job") {
    val dir = stageAll()
    try {
      // garbage_pdf starts with %PDF so magic+type+size all pass here;
      // doc_validate (S10) is the stage that rejects it
      val out = UrlIngest.ingest(Seq(s"file://$dir/garbage_pdf.pdf").toDF("url")).collect()
      assert(out.head.getAs[Boolean]("is_valid"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }

  test("S1: missing file retries maxRetries times then fails the row, not the job") {
    val out = UrlIngest.ingest(
      Seq("file:///nonexistent/nope.pdf").toDF("url"), backoffMs = 1L).collect()
    assert(out.head.getAs[Int]("attempts") == 3)
    assert(out.head.getAs[String]("errors") == "download_failed_after_3_attempts:fetch_error")
    assert(!out.head.getAs[Boolean]("is_valid"))
    assert(out.head.isNullAt(out.head.fieldIndex("file_hash")))
  }

  test("S1: size cap and scheme guard fail fast with stable error kinds") {
    val dir = stageAll()
    try {
      // permanent conditions must NOT burn the retry budget: 1 attempt
      val capped = UrlIngest.ingest(
        Seq(s"file://$dir/policy.docx").toDF("url"), maxBytes = 10L).collect()
      assert(capped.head.getAs[Int]("attempts") == 1)
      assert(capped.head.getAs[String]("errors")
        == "download_failed_after_1_attempts:file_too_large")
      val scheme = UrlIngest.ingest(
        Seq("https://example.com/x.pdf").toDF("url")).collect()
      assert(scheme.head.getAs[Int]("attempts") == 1)
      assert(scheme.head.getAs[String]("errors")
        == "download_failed_after_1_attempts:unsupported_scheme")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }

  test("S1: http transport fetches real bytes from the loopback fixture server") {
    val port = UrlIngest.fixtureServerPort
    val out = UrlIngest.ingest(
      Seq(s"http://127.0.0.1:$port/notes.txt").toDF("url")).collect().head
    assert(out.getAs[Int]("attempts") == 1)
    assert(out.getAs[Boolean]("is_valid"))
    assert(out.getAs[String]("mime_type") == "text/plain")
    assert(out.getAs[String]("file_hash")
      == sha256Hex(UrlIngest.notesTxt.getBytes(UTF_8)))
    assert(out.getAs[Long]("file_size") == UrlIngest.notesTxt.length.toLong)
  }

  test("S1: a 503 is retried through the real backoff path and succeeds on attempt 2") {
    val port = UrlIngest.fixtureServerPort
    val out = UrlIngest.ingest(
      Seq(s"http://127.0.0.1:$port/flaky/notes.txt").toDF("url"),
      backoffMs = 1L).collect().head
    assert(out.getAs[Int]("attempts") == 2, "first attempt must eat the 503")
    assert(out.getAs[Boolean]("is_valid"))
    assert(out.getAs[String]("file_hash")
      == sha256Hex(UrlIngest.notesTxt.getBytes(UTF_8)))
  }

  test("S1: http 404 burns the whole retry budget with the status in the error kind") {
    val port = UrlIngest.fixtureServerPort
    val out = UrlIngest.ingest(
      Seq(s"http://127.0.0.1:$port/never-staged.pdf").toDF("url"),
      backoffMs = 1L).collect().head
    assert(out.getAs[Int]("attempts") == 3)
    assert(out.getAs[String]("errors") == "download_failed_after_3_attempts:http_404")
  }

  test("S1: http size cap fails fast off the Content-Length header") {
    val port = UrlIngest.fixtureServerPort
    val out = UrlIngest.ingest(
      Seq(s"http://127.0.0.1:$port/notes.txt").toDF("url"),
      maxBytes = 10L, backoffMs = 1L).collect().head
    assert(out.getAs[Int]("attempts") == 1, "cap is permanent — no retry")
    assert(out.getAs[String]("errors")
      == "download_failed_after_1_attempts:file_too_large")
  }

  test("sitemap tree: index walks to plain + gz children; cycle, ftp and 404 members drop") {
    import graft.operators.UrlOps
    val base = UrlIngest.sitemapTreeBase
    val out = UrlOps.sitemapTree(
        Seq(s"$base/sitemap-index.xml").toDF("url"), backoffMs = 1)
      .collect()
      .map(r => (r.getAs[String]("sitemap").replaceFirst("^http://[^/]+", ""),
        r.getAs[String]("loc"), r.getAs[String]("lastmod"),
        Option(r.getAs[java.lang.Long]("priority_micro")).map(_.toLong)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out === Seq(
      ("/sitemap-pages.xml.gz", "http://example.com/careers", null, Some(500000L)),
      ("/sitemap-pages.xml.gz", "http://example.com/team", "2026-02-02", None),
      ("/sitemap-posts.xml", "http://example.com/about", null, None),
      ("/sitemap-posts.xml", "http://example.com/blog", "2026-01-15", Some(800000L)),
      ("/sitemap-posts.xml", "http://example.com/search?q=a&lang=en", null, Some(250000L))))
  }

  test("crawl corpus chain: verdict families and near-dup compose over fetched pages") {
    import graft.operators.{Cleaning, Dedup, Html, UrlOps}
    val base = UrlIngest.crawlSiteBase
    // fetch the five articles directly (the full discovery chain is the
    // oracle-checked crawl_corpus_e2e query; this pins the two stages
    // that make corpus membership: verdict + near-dup)
    val urls = Seq("article1", "article2", "dup")
      .map(n => s"$base/$n.html").toDF("url")
    val pages = Html.htmlBlocks(
        UrlIngest.fetchBytes(urls, backoffMs = 1)
          .filter(col("content").isNotNull),
        docCol = "url", binCol = "content")
      .groupBy(col("doc")).agg(collect_list(col("content")).as("cs"))
      .select(col("doc"), array_join(col("cs"), "\n").as("text"))
      .withColumn("doc_id",
        when(col("doc").endsWith("article1.html"), 1L)
          .when(col("doc").endsWith("article2.html"), 2L).otherwise(3L))
    // exact dedup sees only the verbatim mirror…
    val dd = Dedup.exactDups(pages, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_duplicate")).toMap
    assert(dd === Map(1L -> false, 2L -> false, 3L -> true))
    // …while SimHash banding also catches the one-word change
    val nd = Dedup.simhashPairs(pages.select("doc_id", "text"), maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((1L, 2L)) && nd.contains((1L, 3L)))
  }

  test("crawl corpus chain: URL filter, markdown route, NFC, and footer strip") {
    import graft.operators.CrawlCorpus
    val base = UrlIngest.crawlSiteBase
    val rules = CrawlCorpus.siteRules(base)
    val seeds = Seq(s"$base/site.html").toDF("url")
    // the blocklisted tracker link must die at DISCOVERY (before any
    // fetch); without the filter it reaches the frontier
    val unfiltered = CrawlCorpus.discover(spark, seeds, rules)
      .select("url").as[String].collect().toSet
    val filtered = CrawlCorpus.discover(spark, seeds, rules,
        CrawlCorpus.blocklist(spark))
      .select("url").as[String].collect().toSet
    assert(unfiltered.exists(_.contains("tracker.spamads.com")))
    assert(!filtered.exists(_.contains("spamads")))
    assert((unfiltered -- filtered).forall(_.contains("spamads")),
      "the URL filter must drop ONLY the blocklisted link")
    // extraction: markdown routes through the md parser, NFC composes
    // the readme's decomposed accent, the host-wide footer is stripped
    val pages = CrawlCorpus.fetchExtract(seeds,
      CrawlCorpus.schedule(filtered.toSeq.toDF("url")
        .withColumn("priority_micro", lit(0L)), rules))
    val texts = pages.select(col("path"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(texts("/readme.md").contains("Café"), "NFC must compose")
    assert(!texts("/readme.md").contains("\u0301"), "no combining mark survives")
    assert(texts.values.forall(!_.contains("Subscribe to the graft newsletter")),
      "the site-wide footer line is host-statistical boilerplate")
    assert(texts("/article1.html").contains("politely"))
  }

  test("http: redirect chains follow relative Locations and record the hops") {
    val base = s"http://127.0.0.1:${UrlIngest.fixtureServerPort}"
    val rows = UrlIngest.fetchBytes(
        Seq(s"$base/redir/3/notes.txt").toDF("url"), backoffMs = 1)
      .collect()
    val r = rows.head
    assert(r.getAs[Int]("redirects") == 3)
    assert(r.getAs[String]("final_url") == s"$base/notes.txt")
    assert(new String(r.getAs[Array[Byte]]("content"), UTF_8) == UrlIngest.notesTxt)
    assert(r.getAs[String]("content_type") == "text/plain")
    assert(r.getAs[String]("etag") != null)
  }

  test("http: a redirect cycle fails FAST at the hop cap — no retries") {
    val base = s"http://127.0.0.1:${UrlIngest.fixtureServerPort}"
    val r = UrlIngest.fetchBytes(
        Seq(s"$base/redirloop/x").toDF("url"), backoffMs = 1)
      .collect().head
    assert(r.getAs[Array[Byte]]("content") == null)
    assert(r.getAs[Int]("attempts") == 1, "a cycle is permanent — retrying cannot help")
    assert(r.getAs[String]("error")
      == "download_failed_after_1_attempts:too_many_redirects")
  }

  test("http: conditional GET — matching etag 304s with no body, stale etag re-fetches") {
    val base = s"http://127.0.0.1:${UrlIngest.fixtureServerPort}"
    val first = UrlIngest.fetchBytes(
        Seq(s"$base/blog.html").toDF("url"), backoffMs = 1).collect().head
    val liveTag = first.getAs[String]("etag")
    assert(liveTag != null && liveTag.startsWith("\""))
    val out = UrlIngest.fetchBytesConditional(
        Seq((s"$base/blog.html", liveTag, "match"),
            (s"$base/blog.html", "\"stale\"", "stale"),
            (s"$base/blog.html", null, "nulltag"))
          .toDF("url", "etag", "kind"), backoffMs = 1)
      .collect().map(r => r.getAs[String]("kind") -> r).toMap
    assert(out("match").getAs[Boolean]("not_modified"))
    assert(out("match").getAs[Array[Byte]]("content") == null)
    assert(out("match").getAs[String]("etag") == liveTag, "validator kept for the next cycle")
    assert(!out("stale").getAs[Boolean]("not_modified"))
    assert(out("stale").getAs[Array[Byte]]("content") != null)
    assert(out("stale").getAs[String]("etag") == liveTag, "fresh validator returned")
    assert(!out("nulltag").getAs[Boolean]("not_modified"), "null etag = unconditional")
    assert(out("nulltag").getAs[Array[Byte]]("content") != null)
  }

  test("recrawl policy: the due set from fetch history feeds the conditional fetch") {
    import graft.operators.UrlOps
    val base = s"http://127.0.0.1:${UrlIngest.fixtureServerPort}"
    val blog = s"$base/blog.html"
    val notes = s"$base/notes.txt"
    // blog changed on every one of 3 fetches (hot → min interval 100 s,
    // last fetch t=3000, due at now=4000); notes never changed across 3
    // fetches (static → max interval 5000 s, NOT due)
    val history = Seq(
      (blog, 1000L, true), (blog, 2000L, true), (blog, 3000L, true),
      (notes, 1000L, false), (notes, 2000L, false), (notes, 3000L, false))
      .toDF("url", "fetch_ts_sec", "changed")
    val sched = UrlOps.recrawlSchedule(history, nowSec = 4000L,
      minIntervalSec = 100L, maxIntervalSec = 5000L)
    val due = UrlOps.dueTopN(sched, topN = 10).collect()
    assert(due.map(_.getAs[String]("url")).toSeq === Seq(blog))
    assert(due.head.getAs[Long]("interval_sec") === 100L)
    assert(due.head.getAs[Long]("overdue_sec") === 4000L - 3100L)
    val notDue = sched.filter(!col("due")).collect()
    assert(notDue.map(_.getAs[String]("url")).toSeq === Seq(notes))
    assert(notDue.head.getAs[Long]("interval_sec") === 5000L)
    // the due batch rides the stored validator into the conditional
    // fetch: unchanged on the wire → a 304, no body, validator kept
    val etag = UrlIngest.fetchBytes(Seq(blog).toDF("url"), backoffMs = 1)
      .collect().head.getAs[String]("etag")
    val fetched = UrlIngest.fetchBytesConditional(
        UrlOps.dueTopN(sched, 10).select(col("url"), lit(etag).as("etag")),
        backoffMs = 1).collect()
    assert(fetched.length === 1)
    assert(fetched.head.getAs[Boolean]("not_modified"))
    assert(fetched.head.getAs[String]("etag") === etag)
  }

  test("http: Retry-After drives the retry sleep and is capped") {
    val base = s"http://127.0.0.1:${UrlIngest.fixtureServerPort}"
    // capped to 50 ms: attempt 2 must happen well before the header's 1 s
    val t0 = System.nanoTime()
    val capped = UrlIngest.fetchBytes(
        Seq(s"$base/throttle/notes.txt").toDF("url"),
        backoffMs = 0, maxRetryAfterMs = 50).collect().head
    val cappedMs = (System.nanoTime() - t0) / 1e6
    assert(capped.getAs[Int]("attempts") == 2)
    assert(capped.getAs[Array[Byte]]("content") != null)
    assert(cappedMs < 900, s"capped sleep must undercut the 1 s header (took $cappedMs ms)")
    // uncapped: the sleep honors the full Retry-After: 1 lower bound
    // (backoffMs = 0, so ONLY the header can produce the delay)
    val t1 = System.nanoTime()
    val honored = UrlIngest.fetchBytes(
        Seq(s"$base/throttle/blog.html").toDF("url"),
        backoffMs = 0, maxRetryAfterMs = 10000).collect().head
    val honoredMs = (System.nanoTime() - t1) / 1e6
    assert(honored.getAs[Int]("attempts") == 2)
    assert(honoredMs >= 1000, s"Retry-After: 1 not honored (took $honoredMs ms)")
  }

  test("http: gzip Content-Encoding inflates to the plain bytes; the cap bounds the INFLATED size") {
    val base = s"http://127.0.0.1:${UrlIngest.fixtureServerPort}"
    val plain = DocFixtures.blogHtml.getBytes(UTF_8)
    val r = UrlIngest.fetchBytes(
        Seq(s"$base/gzbody/blog.html").toDF("url"), backoffMs = 1)
      .collect().head
    assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("content"), plain),
      "inflated body must equal the staged page byte-for-byte")
    // decompression bomb guard: cap between compressed and inflated
    // sizes must fail the row fast, exactly like an oversized plain body
    val gzLen = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos); g.write(plain); g.close()
      bos.size()
    }
    assert(gzLen < plain.length, "fixture sanity: the page must actually compress")
    val capped = UrlIngest.fetchBytes(
        Seq(s"$base/gzbody/blog.html").toDF("url"),
        maxBytes = gzLen.toLong.max(plain.length / 2L), backoffMs = 1)
      .collect().head
    assert(capped.getAs[Array[Byte]]("content") == null)
    assert(capped.getAs[Int]("attempts") == 1, "cap is permanent — no retry")
    assert(capped.getAs[String]("error")
      == "download_failed_after_1_attempts:file_too_large")
  }

  test("crawl BFS: empty frontier terminates before the depth cap; cycle never re-fetches") {
    import graft.operators.{CrawlCorpus, UrlOps}
    val base = s"http://127.0.0.1:${UrlIngest.fixtureServerPort}"
    val rules = UrlOps.parseRobots(DocFixtures.robotsTxt, "graftbot")
    // cap far beyond the chain: the walk must stop at d (whose page has
    // no links), not spin to depth 9
    val out = CrawlCorpus.bfs(spark,
        Seq(s"$base/bfs-a.html").toDF("url"), rules, maxDepth = 9,
        frontierPartitions = 1)
      .collect()
      .map(r => (r.getString(0).replaceFirst("^http://[^/]+", ""),
        r.getInt(1), r.getBoolean(2)))
      .sortBy(_._2).toSeq
    assert(out === Seq(("/bfs-a.html", 0, true), ("/bfs-b.html", 1, true),
      ("/bfs-c.html", 2, true), ("/bfs-d.html", 3, true)),
      "each page exactly once (the b→a cycle adds no row), walk ends at the leaf")
  }

  test("crawl BFS: the per-round host budget caps a round, dropped pages stay uncrawled") {
    import graft.operators.{CrawlCorpus, UrlOps}
    val base = UrlIngest.crawlSiteBase
    val rules = UrlOps.parseRobots(DocFixtures.robotsTxt, "graftbot")
    val out = CrawlCorpus.bfs(spark, Seq(s"$base/site.html").toDF("url"), rules,
        maxDepth = 1, frontierPartitions = 1, hostBudget = 2)
      .collect()
      .map(r => (r.getString(0).replaceFirst("^http://[^/]+", ""),
        r.getInt(1), r.getBoolean(2)))
      .sortBy(t => (t._2, t._1)).toSeq
    // hub discovery yields /, article1-5, article7, dup, readme.md and
    // the partner tracker (robots drops /private, the scheme gate drops
    // mailto:, the utm twin collapses); budget 2 is PER HOST, so the
    // loopback host keeps its first two in (priority, url) order — '/'
    // 404s but still consumed a fetch slot — while the tracker link
    // (its own host, no URL filter in THIS loop) takes a slot and fails
    // on the wire: exactly the wasted fetch the flagship's RefinedWeb
    // stage exists to prevent
    assert(out === Seq(("/site.html", 0, true),
      ("/", 1, false), ("/article1.html", 1, true), ("/pix.gif", 1, false)))
  }

  test("http: Last-Modified alone revalidates when the server sends no usable ETag") {
    val base = s"http://127.0.0.1:${UrlIngest.fixtureServerPort}"
    val first = UrlIngest.fetchBytes(
        Seq(s"$base/notes.txt").toDF("url"), backoffMs = 1).collect().head
    val lm = first.getAs[String]("last_modified")
    assert(lm != null && lm.endsWith("GMT"))
    val out = UrlIngest.fetchBytesConditional(
        Seq((s"$base/notes.txt", null: String, lm)).toDF("url", "etag", "lm"),
        backoffMs = 1, lastModifiedCol = Some("lm"))
      .collect().head
    assert(out.getAs[Boolean]("not_modified"), "If-Modified-Since echo must 304")
    assert(out.getAs[Array[Byte]]("content") == null)
    // a stale date re-fetches
    val stale = UrlIngest.fetchBytesConditional(
        Seq((s"$base/notes.txt", null: String, "Mon, 01 Jan 1990 00:00:00 GMT"))
          .toDF("url", "etag", "lm"),
        backoffMs = 1, lastModifiedCol = Some("lm"))
      .collect().head
    assert(!stale.getAs[Boolean]("not_modified"))
    assert(stale.getAs[Array[Byte]]("content") != null)
    assert(stale.getAs[String]("last_modified") == lm, "fresh validator returned")
  }

  test("S1: extension mismatch on a supported MIME is flagged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_url_spec").toFile
    try {
      // rfc822 content wearing .txt: text/plain allows .txt AND .eml, so
      // sniff wins with rfc822 whose only extension is .eml → mismatch
      java.nio.file.Files.write(new java.io.File(dir, "mail.txt").toPath,
        DocFixtures.simpleEml.getBytes(UTF_8))
      val out = UrlIngest.ingest(Seq(s"file://$dir/mail.txt").toDF("url")).collect()
      assert(out.head.getAs[String]("errors") == "extension_mismatch")
      assert(!out.head.getAs[Boolean]("is_valid"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }
}
