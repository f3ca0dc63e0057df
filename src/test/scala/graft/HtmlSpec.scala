package graft

import graft.operators.{DocFixtures, Html}

class HtmlSpec extends SparkSpec {

  test("blog fixture: chrome drops, article survives, entities decode") {
    val p = Html.parseHtml(DocFixtures.blogHtml.getBytes("UTF-8")).get
    assert(p.title === Some("Graft & the Web"))
    assert(p.blocks.map(b => (b.block_idx, b.heading, b.content)) === Seq(
      (0, true, "Parsing at scale"),
      (1, false, "Crawled HTML is the dominant raw format for training corpora, and boilerplate removal decides corpus quality."),
      (2, false, "Link density separates navigation chrome from prose: see the docs for the exact thresholds used here."),
      (3, false, "Entities decode: café & résumé stay readable.")))
  }

  test("link-density boundary: exactly 1/3 anchor chars is boilerplate") {
    // 10 anchor chars, 30 total non-ws chars → 10*3 == 30, NOT < → drop;
    // 9 anchor chars over the same total → keep
    def page(anchor: String, tail: String) =
      s"<html><body><p><a href='/'>$anchor</a> $tail</p></body></html>".getBytes("UTF-8")
    val drop = Html.parseHtml(page("abcdefghij", "klmnopqrst uvwxyzabcd")).get
    assert(drop.blocks.isEmpty, "exactly one-third link density must drop")
    val keep = Html.parseHtml(page("abcdefghi", "jklmnopqrst uvwxyzabcd")).get
    assert(keep.blocks.map(_.content) ===
      Seq("abcdefghi jklmnopqrst uvwxyzabcd"))
  }

  test("short non-heading blocks drop; headings of any length survive") {
    val p = Html.parseHtml(
      "<body><h2>Tiny</h2><p>too short</p><div>this sentence runs past the length floor.</div></body>"
        .getBytes("UTF-8")).get
    assert(p.blocks.map(_.content) ===
      Seq("Tiny", "this sentence runs past the length floor."))
    assert(p.blocks.head.heading)
  }

  test("script/style/comment/CDATA bodies never leak; nested chrome stays chrome") {
    val p = Html.parseHtml(
      ("<body><script>document.write('<p>forty characters of injected paragraph</p>')</script>" +
        "<style>.x{}</style><!-- <p>a comment paragraph that is plenty long</p> -->" +
        "<nav><div><p>navigation text inside a nested div stays boilerplate</p></div></nav>" +
        "<p>the one real paragraph of the page body.</p></body>").getBytes("UTF-8")).get
    assert(p.blocks.map(_.content) === Seq("the one real paragraph of the page body."))
  }

  test("entity decoding: named five + nbsp + numeric; unknown stays literal") {
    assert(Html.decodeEntities("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;&nbsp;f")
      === "a & b <c> \"d\" 'e' f")
    assert(Html.decodeEntities("caf&#233; r&#xE9;sum&#xE9; &#x1F600;")
      === "café résumé 😀")
    assert(Html.decodeEntities("&eacute; &unknown; & x &#; &#xZZ;")
      === "&eacute; &unknown; & x &#; &#xZZ;")
    // surrogate code points are NOT valid scalar values: an unpaired
    // surrogate would corrupt to U+FFFD on any UTF-8/parquet round-trip
    assert(Html.decodeEntities("&#xD800; &#55296; &#xDFFF;")
      === "&#xD800; &#55296; &#xDFFF;")
  }

  test("whitespace entities collapse like literal whitespace in blocks and title") {
    // decode-then-collapse: &#10;/&#9;/&nbsp; must not reintroduce
    // newlines or double spaces into "collapsed" block content
    val p = Html.parseHtml(
      ("<head><title>One&#10;Two&nbsp; Three</title></head>" +
        "<body><p>line one&#10;line two&#9;tabbed &nbsp; padded, well past the floor.</p></body>")
        .getBytes("UTF-8")).get
    assert(p.title === Some("One Two Three"))
    assert(p.blocks.map(_.content) ===
      Seq("line one line two tabbed padded, well past the floor."))
  }

  test("raw-text close-tag scan survives length-changing Unicode lowercasing") {
    // 'İ' (U+0130) lowercases to TWO chars under full Unicode rules; if
    // the close-tag index came from such a lowered copy, the parser
    // would resume at the wrong offset and leak script bytes into text
    val p = Html.parseHtml(
      ("<body><p>İİİİ İstanbul prose paragraph long enough to keep around.</p>" +
        "<script>var x = 'İİİİİİİİ<p>injected forty characters of script body</p>';</script>" +
        "<p>the closing real paragraph of the page body.</p></body>").getBytes("UTF-8")).get
    assert(p.blocks.map(_.content) === Seq(
      "İİİİ İstanbul prose paragraph long enough to keep around.",
      "the closing real paragraph of the page body."))
  }

  test("links: hrefs extract in document order — quoted, bare, entity-decoded") {
    val p = Html.parseHtml(DocFixtures.blogHtml.getBytes("UTF-8")).get
    assert(p.links.map(_.href) === Seq("/", "/blog", "/about", "/x", "/a", "/b"))
    assert(p.links.map(_.text) === Seq(
      "Home", "Blog", "About", "the docs", "Ten more posts", "you might like"))
    assert(p.links.forall(!_.nofollow))
    val forms = Html.parseHtml(
      ("<body><a href='/single'>s</a><a href=/bare>b</a>" +
        "<a HREF=\"/page?a=1&amp;b=2\">amp decodes</a>" +
        "<a name='no-href'>skipped</a><a href=''>empty skipped</a>" +
        "<p>padding paragraph long enough to not matter here.</p></body>").getBytes("UTF-8")).get
    assert(forms.links.map(_.href) === Seq("/single", "/bare", "/page?a=1&b=2"))
    // the attribute NAME must be anchored: data-href/ng-href are NOT
    // href — <a data-href="/track" href="/real"> yields /real, and a
    // tag with ONLY data-href yields nothing
    val decoys = Html.parseHtml(
      ("<body><a data-href=\"/track\" href=\"/real\">r</a>" +
        "<a ng-href='/ng' href='/genuine'>g</a>" +
        "<a data-href=\"/only-decoy\">d</a>" +
        "<p>padding paragraph long enough to not matter here.</p></body>").getBytes("UTF-8")).get
    assert(decoys.links.map(_.href) === Seq("/real", "/genuine"))
  }

  test("directives: canonical first-wins, meta robots tokens, anchor text + nofollow") {
    val p = Html.parseHtml(DocFixtures.directivesHtml.getBytes("UTF-8")).get
    assert(p.canonical === Some("https://example.com/the-one-true-url"),
      "cased attrs parse; the SECOND canonical and the stylesheet link are ignored")
    assert(p.metaRobots === Seq("noindex", "nofollow"), "tokens lowercase and split on comma")
    assert(p.links.map(l => (l.href, l.text, l.nofollow)) === Seq(
      ("/paid", "a paid placement", true),
      ("/organic", "the organic reference", false)))
    val none = Html.parseHtml(DocFixtures.directivesNoneHtml.getBytes("UTF-8")).get
    assert(none.metaRobots === Seq("none"))
    val plain = Html.parseHtml(DocFixtures.directivesPlainHtml.getBytes("UTF-8")).get
    assert(plain.canonical === None, "data-rel decoy must not match rel")
    assert(plain.metaRobots === Nil, "name=robots-custom is not name=robots")
    assert(plain.links.map(l => (l.text, l.nofollow)) ===
      Seq(("a normal followable link", false)))
  }

  test("charset detection: meta charset and BOMs beat the UTF-8 default") {
    val l1 = Html.parseHtml(DocFixtures.latin1Html).get
    assert(l1.title === Some("Café menu"))
    assert(l1.blocks.map(_.content) ===
      Seq("Un café crème et un pain au chocolat, s'il vous plaît."))
    val w = Html.parseHtml(DocFixtures.utf16Html).get
    assert(w.title === Some("Wide"))
    assert(w.blocks.map(_.content) ===
      Seq("Sixteen-bit pages decode through the byte-order mark."))
    // UTF-8 BOM strips; unknown charset name falls back to UTF-8
    assert(Html.decodePage(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "<p>x</p>".getBytes("UTF-8")) === Some("<p>x</p>"))
    val unk = ("<meta charset=\"no-such-cs\"><p>plain utf-8 body text here.</p>")
      .getBytes("UTF-8")
    assert(Html.parseHtml(unk).get.blocks.map(_.content) ===
      Seq("plain utf-8 body text here."))
  }

  test("an unterminated <title> cannot swallow the page body") {
    // truncated crawl payloads lose </title> routinely: the first block
    // tag must force the title closed so the body still extracts
    val p = Html.parseHtml(
      "<title>Broken<body><p>the body article text still extracts fine here.</p>"
        .getBytes("UTF-8")).get
    assert(p.title === Some("Broken"))
    assert(p.blocks.map(_.content) ===
      Seq("the body article text still extracts fine here."))
  }

  test("binary garbage yields None; fuzz never throws") {
    assert(Html.parseHtml(Array[Byte]('<'.toByte, 0, 'p'.toByte)).isEmpty)
    val rnd = new scala.util.Random(1717)
    // fuzz every HTML fixture framing: UTF-8, meta-charset Latin-1,
    // BOM'd UTF-16 (flips can corrupt the BOM or the declaration —
    // the charset route itself must be total)
    Seq(DocFixtures.blogHtml.getBytes("UTF-8"),
        DocFixtures.latin1Html, DocFixtures.utf16Html,
        // the directive-bearing pages: flips through rel=/name=/content=
        // attributes and the nofollow link walk must stay total too
        DocFixtures.directivesHtml.getBytes("UTF-8"),
        DocFixtures.canonicalTwinAHtml.getBytes("UTF-8")).foreach { base =>
      (1 to 60).foreach { _ =>
        val b = base.clone()
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        Html.parseHtml(b) // must return, whatever the Option is
      }
      (1 until 15).foreach(k =>
        Html.parseHtml(java.util.Arrays.copyOf(base, base.length * k / 15)))
    }
    val base = DocFixtures.blogHtml.getBytes("UTF-8")
    // hostile: many raw-text opens without closes — single forward scan,
    // must terminate fast and not quadratically
    val hostile = ("<script>" * 2000 + "x").getBytes("UTF-8")
    val t0 = System.nanoTime()
    Html.parseHtml(hostile)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "hostile input must stay linear")
  }

  test("streaming: binaryFile source → html blocks (the crawl-ingest shape)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_htmlstream").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "blog.html").toPath,
        DocFixtures.blogHtml.getBytes("UTF-8"))
      val seen = scala.collection.mutable.ArrayBuffer[(Int, String)]()
      val src = spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
        .option("pathGlobFilter", "*.html").load(dir.getAbsolutePath)
        .withColumn("doc", regexp_extract(col("path"), "([^/]+)\\.html$", 1))
      val q = src.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = Html.htmlBlocks(batch).collect()
            .map(r => (r.getAs[Int]("block_idx"), r.getAs[String]("content")))
          seen.synchronized { seen ++= rows }
          ()
        }
        .start()
      q.awaitTermination(60000L)
      assert(seen.sortBy(_._1).map(_._1) === Seq(0, 1, 2, 3))
      assert(seen.sortBy(_._1).head._2 === "Parsing at scale")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }

  test("spark surface: blocks explode per doc, garbage doc contributes no rows") {
    val rows = Html.htmlBlocks(Html.fixturesDF(spark)).collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[String]("doc")).distinct === Array("blog"))
    assert(rows.map(_.getAs[String]("title")).distinct === Array("Graft & the Web"))
  }
}
