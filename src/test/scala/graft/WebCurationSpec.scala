package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, UrlOps}

/** Unit semantics for the round-18 web-curation additions:
  * [[UrlOps.urlFilter]] (RefinedWeb-style URL filtering) and
  * [[Cleaning.hostLineDedup]] (CCNet-style cross-page boilerplate
  * removal). The registry oracles (`url_filter`, `host_line_dedup`)
  * replay the same math over the documents table; these pin the
  * operator-level corners a synthetic frontier can miss. */
class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  test("registrableDomain: two labels, ccTLD second-level, dotless, deep subdomains") {
    val rows = Seq("sub.badsite.org", "blog.example.co.uk", "localhost",
      "a.b.c.com", "example.net", "www.gov.uk").toDF("host")
      .select(col("host"), UrlOps.registrableDomain(col("host")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("sub.badsite.org") === "badsite.org")
    assert(rows("blog.example.co.uk") === "example.co.uk")
    assert(rows("localhost") === "localhost")
    assert(rows("a.b.c.com") === "c.com")
    assert(rows("example.net") === "example.net")
    // gov.uk is itself a public suffix: the registrable domain of
    // www.gov.uk is the full three-label name (matches the real PSL)
    assert(rows("www.gov.uk") === "www.gov.uk")
  }

  test("urlFilter: blocklist via registrable domain, word score, digits, length") {
    val blocked = Seq("badsite.org", "spamcasino.com").toDF("domain")
    val urls = Seq(
      "http://sub.badsite.org/ok",           // blocked by suffix
      "http://spamcasino.com/page",          // blocked exact + casino(1) < 2
      "http://news.example.com/a",           // clean
      "http://news.example.com/freexxx",     // xxx -> 2 >= 2
      "http://12345678.net/p",               // 8 digits * 2 >= 12 chars
      "http://ok.example.com/" + "y" * 600   // too_long
    ).toDF("url")
    val out = UrlOps.urlFilter(urls, blocked)
      .collect().map(r => r.getAs[String]("url") ->
        (r.getAs[String]("reasons"), r.getAs[Boolean]("keep"))).toMap
    assert(out("http://sub.badsite.org/ok") === ("blocked", false))
    assert(out("http://spamcasino.com/page") === ("blocked", false))
    assert(out("http://news.example.com/a") === ("", true))
    assert(out("http://news.example.com/freexxx") === ("bad_words", false))
    assert(out("http://12345678.net/p") === ("digits", false))
    assert(out("http://ok.example.com/" + "y" * 600) === ("too_long", false))
  }

  test("urlFilter: multiple reasons stay in fixed order") {
    val out = UrlOps.urlFilter(
        Seq("http://spamcasino.com/xxx" + "z" * 600).toDF("url"),
        Seq("spamcasino.com").toDF("domain"))
      .select("reasons").as[String].head()
    assert(out === "blocked,bad_words,too_long")
  }

  test("hostReputation: domain keep rates, the minPages floor, and the " +
      "blocklist feedback into urlFilter") {
    val pages = Seq(
      (1L, "www.good.com"), (2L, "blog.good.com"), (3L, "good.com"),
      (4L, "a.bad.co.uk"), (5L, "b.bad.co.uk"), (6L, "c.bad.co.uk"),
      (7L, "one-page.net") // below minPages: never blocked
    ).toDF("doc_id", "host")
    val verdicts = Seq((1L, true), (2L, true), (3L, false),
      (4L, false), (5L, false), (6L, true), (7L, false)).toDF("doc_id", "keep")
    val rep = UrlOps.hostReputation(pages, verdicts,
        minPages = 3, minKeepRateMicro = 500000L)
    val rows = rep.collect().map(r => r.getAs[String]("domain") ->
      ((r.getAs[Long]("n_pages"), r.getAs[Long]("keep_rate_micro"),
        r.getAs[Boolean]("blocked")))).toMap
    assert(rows("good.com") === ((3L, 666666L, false)))
    assert(rows("bad.co.uk") === ((3L, 333333L, true)))
    assert(rows("one-page.net") === ((1L, 0L, false)),
      "one observation is no statistical basis")
    // the loop closes: the flagged set IS a urlFilter blocklist
    val out = UrlOps.urlFilter(
        Seq("http://x.bad.co.uk/p", "http://www.good.com/p").toDF("url"),
        rep.filter(col("blocked")).select("domain"))
      .collect().map(r => r.getAs[String]("url") -> r.getAs[Boolean]("keep")).toMap
    assert(out === Map("http://x.bad.co.uk/p" -> false,
      "http://www.good.com/p" -> true))
  }

  test("collapseRepeatedLines: case/whitespace-invariant runs collapse to " +
      "one; blanks break runs and never collapse; docs round-trip") {
    val pages = Seq(
      (1L, "Buy now!\n BUY NOW! \nbuy   now!\ncontent a"),
      (2L, "keep\n\n\nkeep"),       // blank run survives; keep repeats NON-adjacently
      (3L, "x\nx\n\nx"),            // blank breaks the run: third x survives
      (4L, null: String)
    ).toDF("doc_id", "text")
    val out = Cleaning.collapseRepeatedLines(pages).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_collapsed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) === ((4L, 2L, "Buy now!\ncontent a")),
      "the FIRST spelling of the run is what survives")
    assert(out(2L) === ((4L, 0L, "keep\n\n\nkeep")))
    assert(out(3L) === ((4L, 1L, "x\n\nx")))
    assert(out(4L) === ((0L, 0L, "")))
  }

  test("paragraphDedup: corpus-wide first occurrence wins; keys are " +
      "whitespace/case-invariant; docs round-trip") {
    val pages = Seq(
      (1L, "Unique intro.\n\nShared closing words."),
      (2L, "Another body.\n\n  SHARED   closing words. "), // same key, other bytes
      (3L, "Shared closing words."),                       // every para drops
      (4L, null: String)
    ).toDF("doc_id", "text")
    val out = Cleaning.paragraphDedup(pages).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_paras"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) === ((2L, 0L, "Unique intro.\n\nShared closing words.")))
    // doc 2 keeps its own paragraph; the shared one drops but the KEPT
    // text stays byte-original elsewhere (keys normalize, text doesn't)
    assert(out(2L) === ((2L, 1L, "Another body.")))
    assert(out(3L) === ((1L, 1L, "")), "all-duplicate docs empty, never vanish")
    assert(out(4L) === ((0L, 0L, "")), "null text round-trips as an empty row")
  }

  test("hostLineDedup: per-host repeated lines drop, small hosts keep all") {
    val pages = Seq(
      // host A, 3 docs: NAV on all 3, PROMO on 2/3 (= 2/3 >= 1/2 drop),
      // RARE on 1/3 (keep)
      (1L, "a", "NAV\nalpha one\nPROMO"),
      (2L, "a", "NAV\nbeta two"),
      (3L, "a", " NAV \nPROMO\ngamma three"),
      // host B, 1 doc: below minDocs — NAV survives here
      (4L, "b", "NAV\ndelta four")
    ).toDF("doc_id", "host", "text")
    val out = Cleaning.hostLineDedup(pages)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))).toMap
    assert(out(1L) === ((2L, "alpha one")))
    assert(out(2L) === ((1L, "beta two")))
    // doc 3's NAV is whitespace-padded: the TRIMMED key matches, the
    // original line is what gets removed
    assert(out(3L) === ((2L, "gamma three")))
    assert(out(4L) === ((0L, "NAV\ndelta four")))
  }

  test("hostLineDedup: blank separator lines are never boilerplate") {
    // every doc on the host uses blank-line paragraph separation — the
    // empty key trivially clears the frequency bar but must NOT strip
    val pages = Seq(
      (1L, "a", "p1\n\np2"),
      (2L, "a", "q1\n\nq2"),
      (3L, "a", "r1\n\nr2")
    ).toDF("doc_id", "host", "text")
    val out = Cleaning.hostLineDedup(pages)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))).toMap
    assert(out(1L) === ((0L, "p1\n\np2")))
    assert(out(2L) === ((0L, "q1\n\nq2")))
  }

  test("hostLineDedup: byte-exact round trip when nothing repeats") {
    val text = "one\n\ntwo words here\n  indented  \nlast"
    val pages = Seq((1L, "a", text), (2L, "a", "totally different\nlines"))
      .toDF("doc_id", "host", "text")
    val out = Cleaning.hostLineDedup(pages)
      .filter(col("doc_id") === 1L)
      .select("n_lines", "n_removed", "clean_text")
      .as[(Long, Long, String)].head()
    assert(out === ((5L, 0L, text)))
  }

  test("urlFilter: IPv4-literal hosts are exempt from the digits rule") {
    val out = UrlOps.urlFilter(
        Seq("http://203.0.113.7/page", "http://12345678.net/p").toDF("url"),
        Seq.empty[String].toDF("domain"))
      .collect().map(r => r.getAs[String]("url") -> r.getAs[String]("reasons")).toMap
    assert(out("http://203.0.113.7/page") === "")
    assert(out("http://12345678.net/p") === "digits")
  }

  test("urlFilter: empty badWords is a legal blocklist-only configuration") {
    val out = UrlOps.urlFilter(
        Seq("http://sub.badsite.org/x", "http://ok.example.com/y").toDF("url"),
        Seq("badsite.org").toDF("domain"), badWords = Seq.empty)
      .collect().map(r => r.getAs[String]("url") ->
        (r.getAs[Long]("bad_word_score"), r.getAs[String]("reasons"))).toMap
    assert(out("http://sub.badsite.org/x") === ((0L, "blocked")))
    assert(out("http://ok.example.com/y") === ((0L, "")))
  }

  test("hostLineDedup: null-text docs round-trip as empty rows, never vanish") {
    val pages = Seq(
      (1L, "a", "NAV\nalpha"),
      (2L, "a", "NAV\nbeta"),
      (3L, "a", null: String)
    ).toDF("doc_id", "host", "text")
    val out = Cleaning.hostLineDedup(pages)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("host"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_removed"), r.getAs[String]("clean_text")))).toMap
    assert(out.size === 3, "every input doc must come back")
    assert(out(3L) === (("a", 0L, 0L, "")))
    assert(out(1L) === (("a", 2L, 1L, "alpha")))
  }

  test("hostLineDedup: within-doc duplicates of a boilerplate line all drop") {
    val pages = Seq(
      (1L, "a", "AD\ncontent x\nAD"),
      (2L, "a", "AD\ncontent y")
    ).toDF("doc_id", "host", "text")
    val out = Cleaning.hostLineDedup(pages)
      .filter(col("doc_id") === 1L)
      .select("n_removed", "clean_text").as[(Long, String)].head()
    assert(out === ((2L, "content x")))
  }
}
