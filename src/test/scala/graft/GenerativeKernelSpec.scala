package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodec, Ocr}

/** Generative (scalacheck) coverage for the pure-JVM media kernels: the
  * fixed fixtures prove specific values; these prove the kernels hold
  * over the input space. Draws are seeded, so failures reproduce. */
class GenerativeKernelSpec extends AnyFunSuite {

  /** n deterministic draws from g (seeded — no flaky CI). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("OCR round-trips arbitrary charset strings through real PNG bytes") {
    val charGen = Gen.oneOf(('A' to 'Z') ++ ('0' to '9'))
    val wordGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, charGen)).map(_.mkString)
    val lineGen = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val pageGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, lineGen))
    samples(pageGen, 25).foreach { lines =>
      val img = ImageIO.read(new ByteArrayInputStream(Ocr.renderPng(lines)))
      assert(Ocr.recognize(img) == lines, s"failed for $lines")
    }
  }

  test("BMP encode-decode reproduces the pixel formulas at arbitrary geometry") {
    val geom = for { w <- Gen.choose(1, 40); h <- Gen.choose(1, 40) } yield (w, h)
    samples(geom, 25).foreach { case (w, h) =>
      val img = ImageIO.read(new ByteArrayInputStream(MediaCodec.bmpBytes(w, h)))
      assert(img.getWidth == w && img.getHeight == h)
      // spot-check the corner pixels + one interior pixel per draw
      for ((x, y) <- Seq((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1), (w / 2, h / 2))) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xFF) == MediaCodec.pixelR(x, y), s"R at ($x,$y) of ${w}x$h")
        assert(((p >> 8) & 0xFF) == MediaCodec.pixelG(x, y))
        assert((p & 0xFF) == MediaCodec.pixelB(x, y))
      }
    }
  }

  test("hand-rolled WAV bytes parse through javax.sound with exact frame math") {
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      ch <- Gen.choose(1, 2)
      frames <- Gen.choose(1, 400)
    } yield (rate, ch, frames)
    samples(gen, 15).foreach { case (rate, ch, frames) =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(MediaCodec.wavBytes(rate, ch, frames)))
      val fmt = in.getFormat
      assert(fmt.getChannels == ch && fmt.getSampleRate.toInt == rate &&
        fmt.getSampleSizeInBits == 16)
      val bytes = in.readAllBytes()
      assert(bytes.length == frames * ch * 2)
      // first frame, channel 0 decodes to the formula value
      val v0 = ((bytes(1) << 8) | (bytes(0) & 0xFF)).toShort.toInt
      assert(v0 == MediaCodec.pcmSample(0, 0))
    }
  }

  test("hand-rolled AVI bytes round-trip through the RIFF walk at arbitrary geometry") {
    val gen = for {
      w <- Gen.choose(1, 24); h <- Gen.choose(1, 20)
      nf <- Gen.choose(1, 8); rate <- Gen.oneOf(10, 25, 30)
    } yield (w, h, nf, rate)
    samples(gen, 15).foreach { case (w, h, nf, rate) =>
      val avi = MediaCodec.parseAvi(MediaCodec.aviBytes(w, h, nf, scale = 1, rate = rate))
      assert((avi.width, avi.height, avi.rate, avi.frames.size) == ((w, h, rate, nf)))
      // spot-check corner + interior pixels of the first and last frames
      val rowBytes = (w * 3 + 3) / 4 * 4
      for (f <- Seq(0, nf - 1); (x, y) <- Seq((0, 0), (w - 1, h - 1), (w / 2, h / 2))) {
        val frame = avi.frames(f)
        assert(frame.length == rowBytes * h)
        val off = (h - 1 - y) * rowBytes + x * 3
        assert((frame(off) & 0xFF) == MediaCodec.frameB(x, y, f), s"B at ($x,$y) f$f of ${w}x$h")
        assert((frame(off + 1) & 0xFF) == MediaCodec.frameG(x, y, f))
        assert((frame(off + 2) & 0xFF) == MediaCodec.frameR(x, y, f))
      }
    }
  }

  test("mjpg AVI bytes round-trip: codec tagged, every frame a decodable JPEG") {
    val gen = for {
      w <- Gen.choose(1, 16); h <- Gen.choose(1, 12); nf <- Gen.choose(1, 4)
    } yield (w, h, nf)
    samples(gen, 8).foreach { case (w, h, nf) =>
      val avi = MediaCodec.parseAvi(MediaCodec.mjpgAviBytes(w, h, nf, scale = 1, rate = 25))
      assert((avi.width, avi.height, avi.codec, avi.frames.size) == ((w, h, "mjpg", nf)))
      avi.frames.foreach { f =>
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(f))
        assert(img != null && img.getWidth == w && img.getHeight == h,
          s"each 00dc chunk must be a standalone JPEG of ${w}x$h")
      }
    }
  }

  test("arbitrary bytes never hang or crash the AVI walk — they throw and drop") {
    val junk = Gen.choose(0, 200).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)))
    // raw junk, RIFF-prefixed junk (penetrates the form check), and a
    // truncated real AVI (penetrates the full header walk)
    val real = MediaCodec.aviBytes(6, 4, 2)
    val cases = samples(junk, 40).map(_.toArray) ++
      samples(junk, 40).map(t => "RIFF".getBytes("US-ASCII") ++
        Array[Byte](8, 0, 0, 0) ++ "AVI ".getBytes("US-ASCII") ++ t.toArray) ++
      (1 until real.length by 13).map(real.take)
    // the property is TERMINATION, so give it teeth: run the whole case
    // sweep under a wall-clock bound — an unbounded loop turns into a
    // red TimeoutException instead of silently wedging the suite
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val outcomes = Await.result(Future {
      cases.map(payload => scala.util.Try(MediaCodec.parseAvi(payload)))
    }, scala.concurrent.duration.Duration(30, "s"))
    // and assert something falsifiable about the sweep: raw junk can
    // never satisfy the RIFF form check, so every one of those cases
    // must throw — while the untruncated fixture parses
    assert(outcomes.take(40).forall(_.isFailure),
      "non-RIFF junk must never parse as an AVI stream")
    assert(scala.util.Try(MediaCodec.parseAvi(real)).isSuccess)
  }

  test("packSentences preserves every word in order and respects maxChars where it can") {
    import graft.operators.Chunking
    val word = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val sentence = for {
      ws <- Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
      p <- Gen.oneOf(".", "!", "?")
    } yield ws.mkString(" ") + p
    val text = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, sentence)).map(_.mkString(" "))
    val cfg = for { t <- text; m <- Gen.choose(20, 120) } yield (t, m)
    samples(cfg, 40).foreach { case (t, maxChars) =>
      val packs = Chunking.packSentences(t, maxChars)
      // lossless: same words, same order
      assert(packs.mkString(" ").split("\\s+").toSeq == t.split("\\s+").toSeq,
        s"words changed for maxChars=$maxChars text=$t")
      // every pack over the limit must be a single unsplittable sentence
      packs.filter(_.length > maxChars).foreach { p =>
        assert(Chunking.packSentences(p, maxChars).size == 1,
          s"oversized pack was splittable: '$p'")
      }
      // greediness: two adjacent packs never fit together
      packs.sliding(2).filter(_.size == 2).foreach { case Seq(a, b) =>
        assert(a.length + 1 + b.split("(?<=[.!?])\\s+").head.length > maxChars,
          s"pack '$a' should have absorbed the next sentence")
      }
    }
  }

  test("combineSmall preserves order/content and only emits undersized tails") {
    import graft.operators.Chunking
    val chunk = Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val cfg = for {
      cs <- Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, chunk))
      m <- Gen.choose(10, 80)
    } yield (cs, m)
    samples(cfg, 40).foreach { case (chunks, minChars) =>
      val out = Chunking.combineSmall(chunks, minChars)
      // lossless modulo the \n\n joiners, order preserved
      assert(out.mkString("\n\n").split("\n\n").toSeq == chunks.mkString("\n\n").split("\n\n").toSeq)
      // reference contract (document_processing_service.py:629-663): an
      // undersized pending run flushes when a LARGE chunk follows — so
      // every undersized output is either the tail or immediately
      // followed by a chunk >= minChars; never two adjacent undersized
      // outputs mid-sequence
      out.sliding(2).filter(_.size == 2).foreach { case Seq(a, b) =>
        assert(a.length >= minChars || b.length >= minChars,
          s"two adjacent undersized outputs for minChars=$minChars: $out")
      }
    }
  }

  test("PDF build-parse round-trips arbitrary pages, escaping included") {
    import graft.operators.{DocExtract, DocFixtures}
    // charset deliberately includes the three escaped PDF chars \ ( )
    val ch = Gen.oneOf(('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      Seq(' ', '.', ',', '-', '(', ')', '\\'))
    val line = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, ch)).map(_.mkString)
      .map(_.trim).suchThat(_.nonEmpty)
    val page = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, line))
    val doc = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, page))
    samples(doc, 25).foreach { pages =>
      val parsed = DocExtract.parsePdf(DocFixtures.pdfBytes(pages))
      assert(parsed.isDefined, s"parse failed for $pages")
      assert(parsed.get.map(_.text) == pages.map(_.mkString("\n")),
        s"text changed through the FlateDecode/Tj/TJ round trip: $pages")
    }
  }

  test("DOCX build-parse round-trips paragraphs, styles, blanks and tables") {
    import graft.operators.{DocExtract, DocFixtures}
    val ch = Gen.oneOf(('a' to 'z') ++ Seq(' ', '&', '<', '>', '.', ','))
    val text = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, ch))
      .map(_.mkString.trim).suchThat(_.nonEmpty)
    val para = for {
      t <- Gen.frequency(1 -> Gen.const(""), 4 -> text) // blanks skip but keep idx
      s <- Gen.oneOf(None, None, Some("Heading1"), Some("Heading2"))
    } yield (t, s)
    val cell = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val table = for {
      cols <- Gen.choose(1, 4); rows <- Gen.choose(2, 4)
      data <- Gen.listOfN(rows, Gen.listOfN(cols, cell))
    } yield data.map(_.toSeq)
    val docGen = for {
      ps <- Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, para))
      ts <- Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, table))
    } yield (ps, ts)
    samples(docGen, 20).foreach { case (paras, tables) =>
      val parsed = DocExtract.parseDocx(DocFixtures.docxBytes(paras, tables))
      assert(parsed.isDefined)
      val expParas = paras.zipWithIndex.filter(_._1._1.trim.nonEmpty).map {
        case ((t, s), i) =>
          val heading = s.exists(_.startsWith("Heading"))
          (i, if (heading) "section" else "paragraph", t, s.getOrElse("Normal"))
      }
      val gotParas = parsed.get.filter(_.chunk_type != "table")
        .map(c => (c.chunk_idx, c.chunk_type, c.content, c.style.get))
      assert(gotParas == expParas, s"paras changed for $paras")
      assert(parsed.get.filter(_.chunk_type == "table").map(_.content) ==
        tables.map(_.map(_.mkString(" | ")).mkString("\n")))
    }
  }

  test("EML parse round-trips arbitrary bodies across all three transfer encodings") {
    import graft.operators.DocExtract
    val word = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val paraGen = Gen.choose(3, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val bodyGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, paraGen)).map(_.mkString("\n\n"))
    val subjGen = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    def msg(subj: String, body: String, enc: String): Array[Byte] = {
      val encoded = enc match {
        case "base64" => java.util.Base64.getMimeEncoder
          .encodeToString(body.getBytes("UTF-8"))
        case "quoted-printable" => body.replace("=", "=3D")
        case _ => body
      }
      (s"Subject: $subj\nFrom: a@x.com\nTo: b@y.com\nDate: Tue, 1 Jul 2026 10:00:00 +0000\n" +
        s"Content-Type: text/plain\nContent-Transfer-Encoding: $enc\n\n$encoded").getBytes("UTF-8")
    }
    val cfg = for { s <- subjGen; b <- bodyGen
                    e <- Gen.oneOf("7bit", "base64", "quoted-printable") } yield (s, b, e)
    samples(cfg, 25).foreach { case (subj, body, enc) =>
      val p = DocExtract.parseEml(msg(subj, body, enc))
      assert(p.isDefined, s"parse failed enc=$enc")
      assert(p.get.subject == subj && p.get.from == "a@x.com")
      assert(p.get.bodyText == body, s"body changed through $enc")
      // chunk rule: headers chunk first, then >20-char paragraphs only
      val chunks = DocExtract.emlChunks(p.get)
      assert(chunks.head.chunk_type == "headers")
      val expected = body.split("\n\n").map(_.trim).filter(_.nonEmpty)
        .zipWithIndex.collect { case (t, i) if t.length > 20 => (i, t) }.toSeq
      assert(chunks.tail.map(c => (c.chunk_idx, c.content)) == expected)
    }
  }

  test("URL ingest computes the reference cache name and hash for arbitrary payloads") {
    import graft.operators.UrlIngest
    val spark2 = TestSpark.spark
    import spark2.implicits._
    def md5Hex(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
    def sha256Hex(b: Array[Byte]) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(b).map("%02x".format(_)).mkString
    val bodyGen = Gen.choose(1, 400)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ Seq(' ', '\n', '.'))))
      .map(_.mkString)
    val dir = java.nio.file.Files.createTempDirectory("graft_url_gen").toFile
    try {
      val cases = samples(bodyGen, 12).zipWithIndex.map { case (body, i) =>
        val f = new java.io.File(dir, s"gen_$i.txt")
        java.nio.file.Files.write(f.toPath, body.getBytes("UTF-8"))
        (s"file://$f", body.getBytes("UTF-8"))
      }
      val out = UrlIngest.ingest(cases.map(_._1).toDF("url")).collect()
        .map(r => r.getAs[String]("url") -> r).toMap
      cases.foreach { case (url, bytes) =>
        val r = out(url)
        // the reference's {md5(url)[:8]}_{sha256[:12]}{ext} cache scheme
        assert(r.getAs[String]("cache_name") ==
          s"${md5Hex(url.getBytes("UTF-8")).take(8)}_${sha256Hex(bytes).take(12)}.txt")
        assert(r.getAs[String]("file_hash") == sha256Hex(bytes))
        assert(r.getAs[Long]("file_size") == bytes.length)
        assert(r.getAs[String]("mime_type") == "text/plain" && r.getAs[Boolean]("is_valid"))
      }
    } finally { dir.listFiles().foreach(_.delete()); dir.delete(); () }
  }

  test("vectorized section splitter agrees with a straightforward scan on arbitrary documents") {
    import graft.operators.Sections
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val upWord = Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, Gen.alphaUpperChar)).map(_.mkString)
    val loWord = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val capWord = for { h <- Gen.alphaUpperChar; t <- loWord } yield s"$h$t"
    val headerGen = Gen.oneOf(
      Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, upWord)).map(_.mkString(" ") + ":"),
      for { d <- Gen.choose(1, 9); t <- capWord } yield s"$d. $t terms:",
      for { w <- capWord; d <- Gen.choose(1, 9); t <- capWord } yield s"$w $d: $t",
      for { c <- Gen.choose('a', 'z'); t <- capWord } yield s"($c) $t clause")
    // body lines start lowercase → can never match a header shape
    val bodyGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, loWord)).map(_.mkString(" "))
    val lineGen = Gen.frequency(1 -> headerGen, 3 -> bodyGen, 1 -> Gen.const(""))
    val docGen = Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, lineGen))

    val pats = Sections.headerPatterns.map(java.util.regex.Pattern.compile)
    def expected(lines: Seq[String]): Seq[(Long, String, String)] = {
      val hpos = lines.zipWithIndex.collect {
        case (l, i) if pats.exists(_.matcher(l).find()) => i + 1 }
      val starts = 0 +: hpos
      val ends = hpos :+ (lines.size + 1)
      starts.indices.map { k =>
        val title = if (k == 0) "Introduction" else lines(starts(k) - 1).trim
        val content = lines.slice(starts(k), ends(k) - 1).mkString("\n").trim
        (k.toLong, title, content)
      }.filter(_._3.nonEmpty)
    }

    val docs = samples(docGen, 30).zipWithIndex.map { case (ls, i) => (i.toLong, ls) }
    val df = docs.map { case (id, ls) => (id, ls.mkString("\n")) }.toDF("doc_id", "text")
    val got = Sections.sectionChunks(df).collect()
      .groupBy(_.getAs[Long]("document_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("section_idx")).map(r =>
        (r.getAs[Long]("section_idx"), r.getAs[String]("section_title"),
          r.getAs[String]("content"))).toSeq).toMap
    docs.foreach { case (id, lines) =>
      assert(got.getOrElse(id, Seq.empty) == expected(lines),
        s"sections diverge for doc $id: $lines")
    }
  }

  test("trimmed OCR glyph templates stay pairwise distinct") {
    val bitmaps = Ocr.trimmedFont.values.toSeq
    assert(bitmaps.distinct.size == bitmaps.size,
      "two glyphs share a trimmed bitmap — recognition would be ambiguous")
  }
}
