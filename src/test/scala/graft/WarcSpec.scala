package graft

import graft.operators.{DocFixtures, Warc}

class WarcSpec extends SparkSpec {

  test("plain and member-gzipped WARC parse to identical records") {
    val plain = Warc.parseWarc(DocFixtures.crawlWarc).get
    val gz = Warc.parseWarc(DocFixtures.crawlWarcGz).get
    assert(plain.length === 5 && gz.length === 5)
    assert(plain.map(_.rec_type) === Seq("warcinfo", "request", "response", "response", "response"))
    plain.zip(gz).foreach { case (a, b) =>
      assert(a.rec_type === b.rec_type && a.url === b.url &&
        a.http_status === b.http_status && a.content_type === b.content_type)
      assert(java.util.Arrays.equals(a.payload, b.payload))
    }
  }

  test("response records split HTTP header from payload; others keep raw body") {
    val recs = Warc.parseWarc(DocFixtures.crawlWarc).get
    val blog = recs(2)
    assert(blog.http_status === Some(200))
    assert(blog.content_type === Some("text/html; charset=utf-8"))
    assert(new String(blog.payload, "UTF-8") === DocFixtures.blogHtml)
    assert(recs(3).http_status === Some(404))
    assert(recs(1).http_status === None) // request: no HTTP response parse
    assert(new String(recs(0).payload, "UTF-8") === "software: graft-crawler/1.0\r\n")
  }

  test("truncation keeps already-parsed records; garbage yields None") {
    val base = DocFixtures.crawlWarc
    // cut inside record 3's body: records 0..2 must survive
    val upTo = {
      val s = new String(base, "ISO-8859-1")
      s.indexOf("Not Found") + 3
    }
    val partial = Warc.parseWarc(java.util.Arrays.copyOf(base, upTo))
    assert(partial.isDefined && partial.get.length === 3)
    assert(Warc.parseWarc("not a warc at all".getBytes("UTF-8")).isEmpty)
    // fuzz: byte flips must never throw
    val rnd = new scala.util.Random(2424)
    (1 to 60).foreach { _ =>
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Warc.parseWarc(b)
      val g = DocFixtures.crawlWarcGz.clone()
      g(rnd.nextInt(g.length)) = rnd.nextInt(256).toByte
      Warc.parseWarc(g)
    }
  }

  test("bare-LF HTTP headers with a CRLF payload split at the FIRST blank line") {
    // a lenient server's LF-only header block must not swallow payload
    // up to the payload's own first CRLF blank line
    val payload = "line one\r\n\r\nline two after a CRLF blank"
    val http = s"HTTP/1.1 200 OK\nContent-Type: Text/HTML\n\n$payload"
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x/\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n").getBytes("ISO-8859-1")
    val parsed = Warc.parseWarc(rec).get
    assert(parsed.length === 1)
    assert(parsed.head.http_status === Some(200))
    assert(new String(parsed.head.payload, "ISO-8859-1") === payload)
    // and the chain's content-type filter is case-insensitive (RFC 9110)
    import spark.implicits._
    val rows = Warc.warcHtmlBlocks(
      Seq(("mixed", ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://x/\r\n" +
        s"Content-Length: ${mixedHttp.length}\r\n\r\n$mixedHttp\r\n\r\n")
        .getBytes("ISO-8859-1"))).toDF("warc", "content")).collect()
    assert(rows.length === 1 && rows.head.getAs[String]("content") ===
      "upper-cased content types must not hide pages from the corpus.")
  }

  private lazy val mixedHttp: String = {
    val html = "<html><body><p>upper-cased content types must not hide pages from the corpus.</p></body></html>"
    s"HTTP/1.1 200 OK\r\nContent-Type: TEXT/Html; charset=utf-8\r\n\r\n$html"
  }

  test("spark chain: only the 200 text/html response reaches html blocks") {
    val rows = Warc.warcHtmlBlocks(Warc.fixturesDF(spark)).collect()
    assert(rows.length === 8) // 4 blocks × 2 framings
    assert(rows.map(_.getAs[String]("url")).distinct === Array("http://example.com/blog"))
    assert(rows.map(_.getAs[String]("warc")).distinct.sorted === Array("crawl", "crawl_gz"))
  }

  test("WARC writer: plain and member-gz shards parse back identically, byte-exact payloads") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    val pages = Seq(
      ("http://x.test/a", "text/html; charset=utf-8",
        "<html><body><p>alpha page body</p></body></html>".getBytes("UTF-8")),
      ("http://x.test/b", "text/plain", "plain bravo\nsecond line\n".getBytes("UTF-8")),
      ("http://x.test/c", null.asInstanceOf[String], Array[Byte](0, 1, 2, 3, 255.toByte)))
      .toDF("url", "content_type", "content")
    def parsed(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(Warc.parseWarcUdf(col("content"))).as("r"))
      .select(col("r.url"), col("r.http_status"), col("r.content_type"),
        col("r.payload"))
      .collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Int]("http_status"),
        r.getAs[String]("content_type"),
        r.getAs[Array[Byte]]("payload").toSeq))
      .sortBy(_._1).toSeq
    val plain = Warc.toWarcShards(pages, nShards = 1)
    val gz = Warc.toWarcShards(pages, nShards = 1, gzipMembers = true)
    // the gz shard really is member-gzipped bytes, name carries the framing
    val gzRow = gz.collect().head
    assert(gzRow.getAs[String]("warc").endsWith(".warc.gz"))
    val gzBytes = gzRow.getAs[Array[Byte]]("content")
    assert((gzBytes(0) & 0xff) == 0x1f && (gzBytes(1) & 0xff) == 0x8b)
    val p = parsed(plain)
    assert(p === parsed(gz), "framings must carry identical records")
    assert(p.map(_._1) === Seq("http://x.test/a", "http://x.test/b", "http://x.test/c"))
    assert(p.forall(_._2 == 200))
    // byte-exact payloads incl. the binary row; null content-type defaults
    assert(p(2)._4 === Seq[Byte](0, 1, 2, 3, -1))
    assert(p(2)._3 == "application/octet-stream")
    assert(p(0)._3 == "text/html; charset=utf-8")
  }

  test("WET writer: conversion records round-trip text byte-exactly; " +
      "gz members slice standalone via CDX") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    val pages = Seq(
      ("http://x.test/a", "alpha text with caf\u00e9 accents"),
      ("http://x.test/b", "beta body"),
      ("http://x.test/c", null: String)
    ).toDF("url", "text")
    for (gz <- Seq(false, true)) {
      val shards = Warc.toWetShards(pages, nShards = 2, gzipMembers = gz)
        .collect()
      val recs = shards.flatMap(r =>
        Warc.parseWarc(r.getAs[Array[Byte]]("content")).get)
        .sortBy(_.url.getOrElse(""))
      assert(recs.map(_.rec_type).toSeq === Seq.fill(3)("conversion"))
      assert(recs.map(_.content_type).toSeq === Seq.fill(3)(Some("text/plain")))
      assert(new String(recs(0).payload, "UTF-8")
        === "alpha text with caf\u00e9 accents")
      assert(recs(2).payload.length === 0, "null text writes an empty record")
      assert(recs.forall(_.http_status.isEmpty), "no HTTP envelope in WET")
    }
    // gz splittability: every CDX slice parses standalone to one record
    // whose digest matches the CDX digest
    val gzShards = Warc.toWetShards(pages, nShards = 2, gzipMembers = true)
      .select(col("content"), explode(col("cdx")).as("m")).collect()
    gzShards.foreach { r =>
      val content = r.getAs[Array[Byte]]("content")
      val m = r.getAs[org.apache.spark.sql.Row]("m")
      val slice = java.util.Arrays.copyOfRange(content,
        m.getAs[Long]("offset").toInt,
        (m.getAs[Long]("offset") + m.getAs[Long]("length")).toInt)
      val recs = Warc.parseWarc(slice).get
      assert(recs.size === 1)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(recs.head.payload).map("%02x".format(_)).mkString
      assert(sha === m.getAs[String]("payload_sha"))
    }
  }
}
