package graft.operators

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{Inflater, ZipInputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4/S8/S9 — binary document extraction with nothing but the JDK
  * (SURVEY.md §2.1; reference extractors at
  * `document_processing_service.py:156-185` (PDF), `:369-457` (DOCX),
  * `:459-537` (email)).
  *
  * The reference shells out to PyMuPDF / python-docx / `email`; the
  * container has no PDFBox/POI jars, so these are ground-up minimal
  * parsers: DOCX is a zip holding `word/document.xml`
  * (`ZipInputStream` + namespace-aware DOM walk), RFC-822 is text
  * (header unfold + multipart walk + QP/base64 transfer decoding), and
  * the PDF reader handles the dominant real-world shapes — classic
  * xref tables AND 1.5+ xref/object streams, FlateDecode content
  * streams with `Tj`/`TJ`/`'` show operators, and composite (CID)
  * fonts via their ToUnicode CMaps (`Inflater` is in the JDK).
  * Encrypted PDFs are out of scope and yield no pages rather than
  * wrong text.
  *
  * Scale shape: each extractor is a scalar UDF over a BINARY column —
  * per-row, zero-shuffle, parallelism = input splits of the
  * `binaryFile` scan. At 100 TB the parse cost dominates and
  * distributes perfectly; nothing crosses the network until the chunk
  * rows hit a downstream aggregate. Parse failures return NULL (the
  * validator surface S10) instead of failing the task, so one corrupt
  * file cannot kill a 1000-executor job.
  */
object DocExtract {

  // ---- DOCX (S8) -------------------------------------------------------

  /** One emitted chunk, mirroring the reference's TextChunk fields for
    * the DOCX path: ALL body paragraphs are enumerated for ids but only
    * non-blank ones emit; `Heading*` styles become `section` chunks
    * carrying their own text as `section_title`; each table becomes one
    * `table` chunk of `" | "`-joined rows (`:390-446`). */
  case class DocxChunk(chunk_idx: Int, chunk_type: String,
                       section_title: Option[String], style: Option[String],
                       content: String)

  private def readZipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zis.getNextEntry).takeWhile(_ != null)
        .collectFirst { case e if e.getName == name => zis.readAllBytes() }
    } finally zis.close()
  }

  /** DOM-parse with external entities disabled (untrusted bytes). */
  private def parseXml(bytes: Array[Byte]): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def childElems(n: org.w3c.dom.Node): Seq[org.w3c.dom.Element] = {
    val kids = n.getChildNodes
    (0 until kids.getLength).map(kids.item)
      .collect { case e: org.w3c.dom.Element => e }
  }

  /** Concatenated text of all `w:t` descendants, in document order. */
  private def paraText(p: org.w3c.dom.Element): String = {
    val sb = new StringBuilder
    def walk(n: org.w3c.dom.Node): Unit = n match {
      case e: org.w3c.dom.Element if e.getLocalName == "t" =>
        sb.append(e.getTextContent)
      case e: org.w3c.dom.Element => childElems(e).foreach(walk)
      case _ => ()
    }
    walk(p)
    sb.toString
  }

  private def paraStyle(p: org.w3c.dom.Element): Option[String] = {
    def find(n: org.w3c.dom.Node): Option[org.w3c.dom.Element] = n match {
      case e: org.w3c.dom.Element if e.getLocalName == "pStyle" => Some(e)
      case e: org.w3c.dom.Element => childElems(e).iterator.map(find).collectFirst { case Some(x) => x }
      case _ => None
    }
    find(p).map { e =>
      val attrs = e.getAttributes
      (0 until attrs.getLength).map(attrs.item)
        .collectFirst { case a: org.w3c.dom.Attr if a.getLocalName == "val" => a.getValue }
        .getOrElse("")
    }.filter(_.nonEmpty)
  }

  /** Parse a DOCX byte array into its chunk rows; None when the bytes
    * are not a readable DOCX (S10 validator signal). */
  def parseDocx(bytes: Array[Byte]): Option[Seq[DocxChunk]] =
    try {
      readZipEntry(bytes, "word/document.xml").map { xml =>
        val doc = parseXml(xml)
        val body = childElems(doc.getDocumentElement)
          .find(_.getLocalName == "body")
          .getOrElse(throw new IllegalArgumentException("no w:body"))
        val kids = childElems(body)
        val paras = kids.filter(_.getLocalName == "p").zipWithIndex.flatMap {
          case (p, idx) =>
            val text = paraText(p)
            if (text.trim.isEmpty) None
            else {
              val style = paraStyle(p)
              val heading = style.exists(_.startsWith("Heading"))
              Some(DocxChunk(idx,
                if (heading) "section" else "paragraph",
                if (heading) Some(text.trim) else None,
                style.orElse(Some("Normal")), text))
            }
        }
        val tables = kids.filter(_.getLocalName == "tbl").zipWithIndex.map {
          case (tbl, tIdx) =>
            val rows = childElems(tbl).filter(_.getLocalName == "tr").map { tr =>
              childElems(tr).filter(_.getLocalName == "tc").map { tc =>
                childElems(tc).filter(_.getLocalName == "p")
                  .map(paraText).mkString("\n").trim
              }.mkString(" | ")
            }
            DocxChunk(tIdx, "table", None, None, rows.mkString("\n"))
        }
        paras ++ tables
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- EML (S9) --------------------------------------------------------

  case class EmlChunk(chunk_idx: Int, chunk_type: String, content: String)

  private def unfoldHeaders(headerBlock: String): Seq[(String, String)] = {
    val unfolded = scala.collection.mutable.ArrayBuffer[String]()
    headerBlock.split("\n", -1).foreach { line =>
      if ((line.startsWith(" ") || line.startsWith("\t")) && unfolded.nonEmpty)
        unfolded(unfolded.size - 1) = unfolded.last + " " + line.trim
      else if (line.nonEmpty) unfolded += line
    }
    unfolded.toSeq.flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some((l.substring(0, i).trim.toLowerCase, l.substring(i + 1).trim))
    }
  }

  private def header(hs: Seq[(String, String)], name: String): String =
    hs.collectFirst { case (k, v) if k == name => v }.getOrElse("")

  private def contentType(hs: Seq[(String, String)]): String = {
    val raw = header(hs, "content-type")
    if (raw.isEmpty) "text/plain" else raw.split(";")(0).trim.toLowerCase
  }

  private def boundary(hs: Seq[(String, String)]): Option[String] = {
    val raw = header(hs, "content-type")
    "(?i)boundary\\s*=\\s*\"?([^\";]+)\"?".r.findFirstMatchIn(raw).map(_.group(1))
  }

  private def decodeQp(s: String): String = {
    val cleaned = s.replace("=\n", "") // soft line breaks
    val out = new java.io.ByteArrayOutputStream()
    def isHex(ch: Char) = (ch >= '0' && ch <= '9') || (ch >= 'A' && ch <= 'F') ||
      (ch >= 'a' && ch <= 'f')
    var i = 0
    while (i < cleaned.length) {
      val c = cleaned.charAt(i)
      // RFC 2045: '=' is an escape ONLY before exactly two hex digits
      // (an explicit check — parseInt would also accept '+9'/'-F')
      if (c == '=' && i + 2 < cleaned.length &&
          isHex(cleaned.charAt(i + 1)) && isHex(cleaned.charAt(i + 2))) {
        out.write(Integer.parseInt(cleaned.substring(i + 1, i + 3), 16)); i += 3
      } else if (c < 0x80) { out.write(c.toInt); i += 1 }
      else if (Character.isHighSurrogate(c) && i + 1 < cleaned.length &&
          Character.isLowSurrogate(cleaned.charAt(i + 1))) {
        // literal chars re-encode as UTF-8, whole code point at a time —
        // per-char encoding would turn a surrogate pair into "??"
        out.write(cleaned.substring(i, i + 2).getBytes(UTF_8)); i += 2
      } else { out.write(c.toString.getBytes(UTF_8)); i += 1 }
    }
    new String(out.toByteArray, UTF_8)
  }

  private def decodeBody(hs: Seq[(String, String)], body: String): String =
    header(hs, "content-transfer-encoding").toLowerCase match {
      case "base64" =>
        new String(java.util.Base64.getMimeDecoder.decode(body.filterNot(_.isWhitespace)), UTF_8)
      case "quoted-printable" => decodeQp(body)
      case _ => body
    }

  /** RFC 2046: the CRLF before each boundary line belongs to the
    * delimiter, so it is stripped from the preceding part's content. */
  private def splitParts(body: String, b: String): Seq[String] = {
    val lines = body.split("\n", -1)
    val parts = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var cur: scala.collection.mutable.ArrayBuffer[String] = null
    var done = false
    lines.foreach { line =>
      if (!done) {
        // RFC 2046 §5.1.1: boundary delimiter lines may carry trailing
        // transport padding (spaces/tabs) — strip it before comparing
        val l = line.replaceAll("[ \t]+$", "")
        if (l == s"--$b--") { if (cur != null) parts += cur.toSeq; cur = null; done = true }
        else if (l == s"--$b") { if (cur != null) parts += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer[String]() }
        else if (cur != null) cur += line
      }
    }
    if (cur != null) parts += cur.toSeq
    parts.toSeq.map(_.mkString("\n"))
  }

  /** Depth-first `msg.walk()` collecting decoded text/plain bodies. */
  private def collectPlainText(hs: Seq[(String, String)], body: String): String = {
    val ct = contentType(hs)
    if (ct.startsWith("multipart/")) {
      boundary(hs) match {
        case Some(b) =>
          splitParts(body, b).map { part =>
            val i = part.indexOf("\n\n")
            val (ph, pb) = if (i < 0) (part, "") else (part.substring(0, i), part.substring(i + 2))
            collectPlainText(unfoldHeaders(ph), pb)
          }.mkString
        case None => ""
      }
    } else if (ct == "text/plain") decodeBody(hs, body)
    else ""
  }

  case class EmlParsed(subject: String, from: String, to: String, date: String,
                       headerText: String, bodyText: String, multipart: Boolean)

  def parseEml(bytes: Array[Byte]): Option[EmlParsed] =
    try {
      val raw = new String(bytes, UTF_8).replace("\r\n", "\n")
      val i = raw.indexOf("\n\n")
      val (headerBlock, body) = if (i < 0) (raw, "") else (raw.substring(0, i), raw.substring(i + 2))
      val hs = unfoldHeaders(headerBlock)
      if (hs.isEmpty) None
      else {
        val ct = contentType(hs)
        val headerText = s"Subject: ${header(hs, "subject")}\nFrom: ${header(hs, "from")}\n" +
          s"To: ${header(hs, "to")}\nDate: ${header(hs, "date")}"
        Some(EmlParsed(header(hs, "subject"), header(hs, "from"), header(hs, "to"),
          header(hs, "date"), headerText, collectPlainText(hs, body),
          ct.startsWith("multipart/")))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Chunk rows of one message: the headers chunk (idx -1) then body
    * paragraphs split on blank lines, non-blank ones enumerated, only
    * those > `minChars` emitted (`document_processing_service.py:505-525`). */
  def emlChunks(p: EmlParsed, minChars: Int = 20): Seq[EmlChunk] = {
    val paras = p.bodyText.split("\n\n").map(_.trim).filter(_.nonEmpty)
    EmlChunk(-1, "headers", p.headerText) +:
      paras.zipWithIndex.collect {
        case (para, idx) if para.length > minChars => EmlChunk(idx, "paragraph", para)
      }.toSeq
  }

  // ---- PDF (S4, minimal) ----------------------------------------------

  case class PdfPage(page: Int, text: String)

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n == 0 && !inf.finished()) throw new java.util.zip.DataFormatException("stalled")
      out.write(buf, 0, n)
    }
    // input exhausted before the deflate stream closed = truncated data;
    // partial text must become None (the module contract), never emitted
    if (!inf.finished()) {
      inf.end()
      throw new java.util.zip.DataFormatException("truncated deflate stream")
    }
    inf.end()
    out.toByteArray
  }

  /** Decode one text-showing content stream: `Tj`/`'` show the last
    * string, `TJ` shows each string in its array, and `Td`/`TD`/`T*`/`'`
    * start a new output line. Escapes `\( \) \\ \n \r \t` and octal. */
  /** Decode one hex show-string's digits to text: odd length pads a
    * trailing 0; an even byte count whose high bytes are all zero is
    * UTF-16BE (Identity-H's ASCII/Latin-1 layout), else Latin-1. */
  private def decodeHexShow(raw: String): String = {
    // lenient: drop anything non-hex (malformed bytes in a damaged
    // stream must degrade to less text, not fail the page)
    val hex = raw.filter(ch => Character.digit(ch, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val bytes = padded.grouped(2).map(h =>
      Integer.parseInt(h, 16).toByte).toArray
    val utf16 = bytes.length >= 2 && bytes.length % 2 == 0 &&
      bytes.indices.forall(k => k % 2 == 1 || bytes(k) == 0)
    if (utf16) new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE)
    else new String(bytes, ISO_8859_1)
  }

  /** A font's ToUnicode CMap: composite-font (CID) show-strings are
    * sequences of `codeBytes`-wide codes, each mapped to a Unicode
    * string (often multi-char: ligatures). The CODES ARE NOT CHARACTER
    * VALUES — without this table a CID page's hex strings decode to
    * whatever the code assignment happened to be (reference behavior:
    * PyMuPDF consults the same table,
    * `document_processing_service.py:156-185`). */
  private[graft] final case class ToUnicodeCMap(codeBytes: Int, map: Map[Int, String])

  /** Parse a ToUnicode CMap stream (PDF 32000-1 §9.10.3): the code
    * width comes from `begincodespacerange`, the mappings from
    * `beginbfchar` pairs and `beginbfrange` triples (both the
    * incrementing `<lo> <hi> <dst>` form — the LAST UTF-16 code unit
    * increments — and the explicit-array form). Destinations are
    * UTF-16BE per spec. Lenient: unknown tokens are skipped, a
    * malformed section contributes nothing (less text, never wrong
    * text), and range width is capped so a hostile `<0000> <FFFF>`
    * cannot blow past the 2-byte code space. */
  private[graft] def parseToUnicode(text: String): ToUnicodeCMap = {
    def hexBytes(h: String): Array[Byte] = {
      val hex = h.filter(ch => Character.digit(ch, 16) >= 0)
      val padded = if (hex.length % 2 == 1) hex + "0" else hex
      padded.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray
    }
    def hexInt(h: String): Int =
      hexBytes(h).foldLeft(0)((acc, b) => (acc << 8) | (b & 0xff))
    def hexStr(h: String): String =
      new String(hexBytes(h), java.nio.charset.StandardCharsets.UTF_16BE)
    // tokens: <hex>, [, ], keywords; numbers and everything else inert
    val tok = "<[0-9a-fA-F\\s]*>|\\[|\\]|[A-Za-z]+".r
    val toks = tok.findAllIn(text).toArray
    var codeBytes = 2
    // TOTAL cap across ALL sections, not per range: a hostile stream of
    // thousands of repeated <0000> <FFFF> ranges would otherwise
    // amplify ~30 bytes each into 2^16 entries each (an OOM the Try in
    // fontsOf cannot catch). 2^16 is the whole 2-byte code space — a
    // legitimate CMap cannot need more distinct codes than that.
    val MaxEntries = 0x10000
    val map = scala.collection.mutable.Map[Int, String]()
    var i = 0
    def isHex(t: String) = t.startsWith("<")
    def inner(t: String) = t.substring(1, t.length - 1)
    while (i < toks.length) {
      toks(i) match {
        case "begincodespacerange" =>
          if (i + 1 < toks.length && isHex(toks(i + 1))) {
            val w = inner(toks(i + 1)).count(ch => Character.digit(ch, 16) >= 0) / 2
            if (w >= 1 && w <= 4) codeBytes = w
          }
          while (i < toks.length && toks(i) != "endcodespacerange") i += 1
        case "beginbfchar" =>
          i += 1
          while (i + 1 < toks.length && isHex(toks(i)) && isHex(toks(i + 1))) {
            if (map.size < MaxEntries)
              map(hexInt(inner(toks(i)))) = hexStr(inner(toks(i + 1)))
            i += 2
          }
          i -= 1 // main loop advances past endbfchar / the stray token
        case "beginbfrange" =>
          i += 1
          var ok = true
          while (ok && i + 2 < toks.length && isHex(toks(i)) && isHex(toks(i + 1))) {
            val lo = hexInt(inner(toks(i)))
            val hi = hexInt(inner(toks(i + 1)))
            val n = hi - lo
            if (n < 0 || n > 0xffff) ok = false
            else toks(i + 2) match {
              case "[" =>
                i += 3
                var c = lo
                while (i < toks.length && toks(i) != "]") {
                  if (isHex(toks(i)) && c <= hi) {
                    if (map.size < MaxEntries) map(c) = hexStr(inner(toks(i)))
                    c += 1
                  }
                  i += 1
                }
                i += 1 // past ]
              case d if isHex(d) =>
                val dst = hexStr(inner(d))
                var k = 0
                while (k <= n && map.size < MaxEntries) {
                  map(lo + k) =
                    if (dst.isEmpty) ""
                    else dst.dropRight(1) + (dst.last + k).toChar
                  k += 1
                }
                i += 3
              case _ => ok = false
            }
          }
          i -= 1
        case _ => ()
      }
      i += 1
    }
    ToUnicodeCMap(codeBytes, map.toMap)
  }

  /** Map a CID show-string's raw bytes through a ToUnicode CMap.
    * Unmapped codes emit nothing — degrade to less text, never to
    * wrong text (the module contract). */
  private def mapCodes(cm: ToUnicodeCMap, bytes: Array[Byte]): String = {
    val w = cm.codeBytes
    val sb = new StringBuilder
    var k = 0
    while (k + w <= bytes.length) {
      var code = 0
      var j = 0
      while (j < w) { code = (code << 8) | (bytes(k + j) & 0xff); j += 1 }
      sb.append(cm.map.getOrElse(code, ""))
      k += w
    }
    sb.toString
  }

  private[graft] def decodeContentOps(ops: String): String =
    decodeContentOps(ops, Map.empty)

  /** As [[decodeContentOps]], with per-font ToUnicode CMaps: `Tf`
    * tracks the current font by resource name, and show-strings (hex
    * AND literal — a composite font encodes both) decode through its
    * CMap when one exists; fonts without one keep the byte-level
    * heuristics. */
  private[graft] def decodeContentOps(ops: String,
                                      fonts: Map[String, ToUnicodeCMap]): String = {
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var pendingNl = false
    def emit(s: String): Unit = {
      if (pendingNl && cur.nonEmpty) { lines += cur.toString; cur.clear() }
      pendingNl = false
      cur.append(s)
    }
    def newline(): Unit = pendingNl = true
    var i = 0
    val n = ops.length
    var lastStrings = scala.collection.mutable.ArrayBuffer[String]()
    var inArray = false
    def readString(): String = {
      // ops(i) == '(' on entry
      val sb = new StringBuilder
      var depth = 1
      i += 1
      while (i < n && depth > 0) {
        val c = ops.charAt(i)
        if (c == '\\' && i + 1 < n) {
          val e = ops.charAt(i + 1)
          e match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case '(' | ')' | '\\' => sb.append(e); i += 2
            case d if d >= '0' && d <= '7' =>
              val oct = ops.substring(i + 1, math.min(i + 4, n)).takeWhile(ch => ch >= '0' && ch <= '7')
              sb.append(Integer.parseInt(oct, 8).toChar); i += 1 + oct.length
            case _ => sb.append(e); i += 2
          }
        } else {
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          if (depth > 0) sb.append(c)
          i += 1
        }
      }
      sb.toString
    }
    var lastName: String = null // most recent /Name operand (Tf's font)
    var curCmap: ToUnicodeCMap = null
    def viaCmap(byteChars: String): String =
      if (curCmap == null) byteChars
      else mapCodes(curCmap, byteChars.toCharArray.map(_.toByte))
    while (i < n) {
      val c = ops.charAt(i)
      if (c == '/') {
        val j0 = i + 1
        i += 1
        while (i < n && !ops.charAt(i).isWhitespace && "()<>[]{}/%".indexOf(ops.charAt(i)) < 0) i += 1
        lastName = ops.substring(j0, i)
      }
      else if (c == '(') lastStrings += viaCmap(readString())
      else if (c == '<') {
        // hex show-string `<48656C6C6F>` — the form CID/Identity-H
        // text uses. `<<` opens an (inline-image or marked-content)
        // dict instead: skip the delimiters, its body parses as inert
        // ops. Odd hex length pads a trailing 0 (spec §7.3.4.3);
        // 2-byte codes with zero high bytes decode as UTF-16BE (the
        // Identity-H ASCII/Latin layout), anything else as Latin-1
        // bytes. When the CURRENT FONT carries a ToUnicode CMap
        // (composite/CID font), codes map through it instead — the
        // heuristic is only the no-CMap fallback
        if (i + 1 < n && ops.charAt(i + 1) == '<') i += 2
        else {
          val e = ops.indexOf('>', i + 1)
          val hex = (if (e < 0) ops.substring(i + 1) else ops.substring(i + 1, e))
            .filterNot(_.isWhitespace)
          i = if (e < 0) n else e + 1
          lastStrings += (
            if (curCmap != null) {
              val digits = hex.filter(ch => Character.digit(ch, 16) >= 0)
              val padded = if (digits.length % 2 == 1) digits + "0" else digits
              mapCodes(curCmap, padded.grouped(2)
                .map(h => Integer.parseInt(h, 16).toByte).toArray)
            } else decodeHexShow(hex))
        }
      }
      else if (c == '[') { inArray = true; lastStrings.clear(); i += 1 }
      else if (c == ']') { inArray = false; i += 1 }
      else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        val j0 = i
        while (i < n && !ops.charAt(i).isWhitespace && ops.charAt(i) != '(' && ops.charAt(i) != '[') i += 1
        val op = ops.substring(j0, i)
        op match {
          case "Tj" => lastStrings.lastOption.foreach(emit); lastStrings.clear()
          case "TJ" => emit(lastStrings.mkString); lastStrings.clear()
          case "'" | "\"" => newline(); lastStrings.lastOption.foreach(emit); lastStrings.clear()
          case "Td" | "TD" | "T*" => newline(); if (!inArray) lastStrings.clear()
          case "BT" | "ET" => lastStrings.clear()
          case "Tf" => // `/F1 12 Tf` — select the current font's CMap
            curCmap = if (lastName == null) null
                      else fonts.get(lastName).orNull
          case _ => () // numbers handled below, other ops ignored
        }
      } else i += 1
    }
    if (cur.nonEmpty) lines += cur.toString
    lines.mkString("\n")
  }

  // ---- PDF object model + xref-driven reader (S4, PDF 1.5+) -----------
  //
  // PDFs written since 1.5 replace the classic `xref` table with a
  // cross-reference STREAM (FlateDecode + usually a PNG row predictor)
  // and pack non-stream objects into object streams (`/Type /ObjStm`) —
  // the reference's PyMuPDF reads these transparently
  // (document_processing_service.py:156-185). Both constructs are
  // themselves FlateDecode, so a JDK-only reader stays feasible: the
  // reader below resolves startxref → xref chain (classic tables, xref
  // streams, hybrid /XRefStm trailers, /Prev links) → /Root → the page
  // TREE → per-page /Contents (single ref or array, /Length direct or
  // indirect), which also fixes page ATTRIBUTION (tree order, not
  // stream-in-file order). Anything it cannot resolve falls back to the
  // linear whole-file stream scan ([[parsePdfLinear]]), which remains
  // the right answer for damaged files.

  /** Minimal PDF COS value model — just what xref/page traversal needs. */
  private[graft] sealed trait PVal
  private[graft] case class PNum(v: Double) extends PVal { def toInt: Int = v.toInt }
  private[graft] case class PRef(num: Int) extends PVal
  private[graft] case class PName(v: String) extends PVal
  private[graft] case class PStr(v: String) extends PVal
  private[graft] case class PDict(m: Map[String, PVal]) extends PVal
  private[graft] case class PArr(items: Vector[PVal]) extends PVal
  private[graft] case object PNullV extends PVal
  private[graft] case class PBool(v: Boolean) extends PVal

  /** Recursive-descent lexer over the ISO-8859-1 view (char index ==
    * byte offset). Parses dicts/arrays/names/numbers/refs/strings —
    * strings only far enough to skip them correctly (escapes, nested
    * parens, hex). */
  private[graft] final class PdfLex(s: String, var i: Int) {
    private def isDelim(c: Char) = "()<>[]{}/%".indexOf(c) >= 0
    def ws(): Unit = {
      var go = true
      while (go && i < s.length) {
        val c = s.charAt(i)
        if (c == '%') while (i < s.length && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
        else if (c.isWhitespace || c == 0) i += 1
        else go = false
      }
    }
    def keyword(): String = {
      ws(); val j = i
      while (i < s.length && !s.charAt(i).isWhitespace && !isDelim(s.charAt(i))) i += 1
      s.substring(j, i)
    }
    private def name(): PName = {
      i += 1 // '/'
      val sb = new StringBuilder
      while (i < s.length && !s.charAt(i).isWhitespace && !isDelim(s.charAt(i))) {
        if (s.charAt(i) == '#' && i + 2 < s.length) {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      PName(sb.toString)
    }
    private def number(): Double = {
      val j = i
      if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      s.substring(j, i).toDouble
    }
    private def litString(): PStr = {
      var depth = 1; i += 1
      val j = i
      while (i < s.length && depth > 0) {
        val c = s.charAt(i)
        if (c == '\\') i += 2
        else { if (c == '(') depth += 1 else if (c == ')') depth -= 1; i += 1 }
      }
      PStr(s.substring(j, math.max(j, i - 1)))
    }
    def value(): PVal = {
      ws()
      if (i >= s.length) throw new IllegalArgumentException("pdf: eof in value")
      s.charAt(i) match {
        case '<' if i + 1 < s.length && s.charAt(i + 1) == '<' =>
          i += 2
          val m = scala.collection.mutable.LinkedHashMap[String, PVal]()
          var closed = false
          while (!closed) {
            ws()
            if (i + 1 < s.length && s.charAt(i) == '>' && s.charAt(i + 1) == '>') { i += 2; closed = true }
            else { val k = name().v; m(k) = value() }
          }
          PDict(m.toMap)
        case '<' =>
          val e = s.indexOf('>', i + 1)
          val v = PStr(s.substring(i + 1, if (e < 0) s.length else e))
          i = (if (e < 0) s.length else e + 1); v
        case '[' =>
          i += 1
          val items = Vector.newBuilder[PVal]
          var closed = false
          while (!closed) {
            ws()
            if (i < s.length && s.charAt(i) == ']') { i += 1; closed = true }
            else items += value()
          }
          PArr(items.result())
        case '/' => name()
        case '(' => litString()
        case c if c.isDigit || c == '+' || c == '-' || c == '.' =>
          val n1 = number()
          // `n g R` lookahead: an integer followed by a generation
          // integer and a bare R is an indirect reference
          if (n1 >= 0 && n1 == math.floor(n1)) {
            val save = i
            ws()
            if (i < s.length && s.charAt(i).isDigit) {
              number(); ws()
              if (i < s.length && s.charAt(i) == 'R' &&
                  (i + 1 >= s.length || s.charAt(i + 1).isWhitespace || isDelim(s.charAt(i + 1)))) {
                i += 1
                return PRef(n1.toInt)
              }
            }
            i = save
          }
          PNum(n1)
        case _ =>
          keyword() match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "null" => PNullV
            case k => throw new IllegalArgumentException(s"pdf: unexpected token '$k'")
          }
      }
    }
  }

  /** Undo a /DecodeParms predictor. PNG predictors (≥10) carry a
    * per-row filter byte (None/Sub/Up/Average/Paeth — RFC 2083 §6);
    * TIFF predictor 2 is a horizontal byte diff. Only 8-bit components
    * are supported (all an xref stream ever uses). */
  private def unpredict(data: Array[Byte], predictor: Int, columns: Int,
                        colors: Int): Array[Byte] = {
    if (predictor <= 1) return data
    val bpp = math.max(1, colors)
    val rowLen = columns * colors
    if (predictor == 2) {
      val out = data.clone()
      var r = 0
      while (r + rowLen <= out.length) {
        var c = bpp
        while (c < rowLen) { out(r + c) = ((out(r + c) + out(r + c - bpp)) & 0xff).toByte; c += 1 }
        r += rowLen
      }
      return out
    }
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var c = 0
      while (c < rowLen) {
        val rawB = data(src + c) & 0xff
        val left = if (c >= bpp) out(dst + c - bpp) & 0xff else 0
        val up = if (r > 0) out(dst - rowLen + c) & 0xff else 0
        val ul = if (r > 0 && c >= bpp) out(dst - rowLen + c - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => rawB
          case 1 => rawB + left
          case 2 => rawB + up
          case 3 => rawB + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val (pa, pb, pc) = (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
            rawB + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => throw new IllegalArgumentException(s"pdf: png filter $ft")
        }
        out(dst + c) = (rec & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  /** One loaded PDF: xref entries, object cache, page-tree walk.
    * Throws on anything unsupported — [[parsePdf]] catches and falls
    * back to the linear scan. */
  private final class PdfDoc(bytes: Array[Byte], raw: String) {
    /** obj num → Left(byte offset) | Right((container ObjStm num, idx)). */
    private val entries = scala.collection.mutable.Map[Int, Either[Long, (Int, Int)]]()
    private var rootRef: Option[PRef] = None
    /** Any trailer in the xref chain carried /Encrypt: strings and
      * streams are ciphertext — decoding must not be attempted. */
    var isEncrypted: Boolean = false
    private val cache = scala.collection.mutable.Map[Int, (PVal, Option[Array[Byte]])]()
    private val loading = scala.collection.mutable.Set[Int]()

    private def bigToInt(v: PVal, what: String): Int = v match {
      case PNum(n) => n.toInt
      case PRef(n) => resolve(PRef(n)) match {
        case PNum(m) => m.toInt
        case _ => throw new IllegalArgumentException(s"pdf: $what ref not numeric")
      }
      case _ => throw new IllegalArgumentException(s"pdf: $what not numeric")
    }

    /** Decode a stream body: /Length (direct or indirect; endstream
      * scan as last resort), then /Filter (+/DecodeParms). */
    private def streamData(d: PDict, afterDict: Int, allowIndirectLen: Boolean): Array[Byte] = {
      val si = raw.indexOf("stream", afterDict)
      if (si < 0) throw new IllegalArgumentException("pdf: stream keyword missing")
      var ds = si + "stream".length
      if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
      if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
      val len = d.m.get("Length") match {
        case Some(PNum(n)) => Some(n.toInt)
        case Some(r: PRef) if allowIndirectLen => Some(bigToInt(r, "Length"))
        case _ => None
      }
      val de = len.map(ds + _)
        .getOrElse { val e = raw.indexOf("endstream", ds); if (e < 0) raw.length else e }
      val data = java.util.Arrays.copyOfRange(bytes, ds, math.min(de, bytes.length))
      val filters: Seq[String] = d.m.get("Filter") match {
        case Some(PName(f)) => Seq(f)
        case Some(PArr(fs)) => fs.collect { case PName(f) => f }
        case None => Seq.empty
        case _ => throw new IllegalArgumentException("pdf: bad /Filter")
      }
      val decoded = filters.foldLeft(data) {
        case (acc, "FlateDecode") => inflate(acc)
        case (_, other) => throw new IllegalArgumentException(s"pdf: filter $other unsupported")
      }
      d.m.get("DecodeParms").orElse(d.m.get("DP")).map(resolve) match {
        case Some(PDict(p)) =>
          val pred = p.get("Predictor").map(bigToInt(_, "Predictor")).getOrElse(1)
          val cols = p.get("Columns").map(bigToInt(_, "Columns")).getOrElse(1)
          val colors = p.get("Colors").map(bigToInt(_, "Colors")).getOrElse(1)
          unpredict(decoded, pred, cols, colors)
        case _ => decoded
      }
    }

    /** `N G obj <value> [stream …]` at a byte offset. */
    private def parseObjAt(off: Int): (PVal, Option[Array[Byte]]) = {
      val lex = new PdfLex(raw, off)
      lex.keyword(); lex.keyword() // obj number, generation
      if (lex.keyword() != "obj") throw new IllegalArgumentException("pdf: obj keyword missing")
      val v = lex.value()
      lex.ws()
      if (raw.startsWith("stream", lex.i))
        (v, Some(streamData(v.asInstanceOf[PDict], lex.i - 1, allowIndirectLen = true)))
      else (v, None)
    }

    /** Decoded ObjStm → (objnum → parse offset past /First) header map
      * plus body string. Memoized: a production ObjStm can hold
      * thousands of objects, and re-parsing the header per contained
      * object would be O(N²). */
    private val objStmCache = scala.collection.mutable.Map[Int, (Map[Int, Int], String, Int)]()
    private def objStmParts(stmNum: Int): (Map[Int, Int], String, Int) = objStmCache.getOrElseUpdate(stmNum, {
      val (d, dataOpt) = obj(stmNum)
      val dict = d match { case p: PDict => p; case _ => throw new IllegalArgumentException("pdf: ObjStm not dict") }
      val data = dataOpt.getOrElse(throw new IllegalArgumentException("pdf: ObjStm without stream"))
      val n = bigToInt(dict.m("N"), "N")
      val first = bigToInt(dict.m("First"), "First")
      val body = new String(data, ISO_8859_1)
      val lex = new PdfLex(body, 0)
      val header = (0 until n).map { _ =>
        val num = lex.keyword().toInt
        val o = lex.keyword().toInt
        num -> o
      }.toMap
      (header, body, first)
    })

    /** Load object `num` through the xref map, memoized, cycle-guarded. */
    def obj(num: Int): (PVal, Option[Array[Byte]]) = cache.getOrElseUpdate(num, {
      if (!loading.add(num)) throw new IllegalArgumentException(s"pdf: circular object $num")
      try entries.get(num) match {
        case Some(Left(off)) => parseObjAt(off.toInt)
        case Some(Right((stm, _))) =>
          val (header, body, first) = objStmParts(stm)
          val o = header.getOrElse(num, throw new IllegalArgumentException(s"pdf: $num not in ObjStm $stm"))
          (new PdfLex(body, first + o).value(), None)
        case None => (PNullV, None)
      } finally loading.remove(num)
    })

    def resolve(v: PVal): PVal = v match {
      case PRef(n) => obj(n)._1
      case other => other
    }

    /** Classic `xref` table at `pos` → trailer dict. First-seen entry
      * wins (later tables in the /Prev chain are OLDER). */
    private def classicXref(pos: Int): PDict = {
      val lex = new PdfLex(raw, pos)
      if (lex.keyword() != "xref") throw new IllegalArgumentException("pdf: xref keyword missing")
      var trailer: Option[PDict] = None
      while (trailer.isEmpty) {
        lex.ws()
        if (raw.startsWith("trailer", lex.i)) {
          lex.keyword()
          trailer = Some(lex.value().asInstanceOf[PDict])
        } else {
          val start = lex.keyword().toInt
          val count = lex.keyword().toInt
          (0 until count).foreach { k =>
            val off = lex.keyword().toLong
            lex.keyword() // generation
            val tpe = lex.keyword()
            if (tpe == "n" && !entries.contains(start + k)) entries(start + k) = Left(off)
          }
        }
      }
      trailer.get
    }

    /** Xref STREAM at `pos` (`/Type /XRef`): decode, walk /W-sized rows
      * over the /Index subsections. The stream dict doubles as the
      * trailer. */
    private def xrefStream(pos: Int): PDict = {
      val (v, dataOpt) = parseObjAt(pos)
      val dict = v match { case d: PDict => d; case _ => throw new IllegalArgumentException("pdf: xref obj not dict") }
      val data = dataOpt.getOrElse(throw new IllegalArgumentException("pdf: xref stream missing body"))
      val w = dict.m("W") match {
        case PArr(ws) => ws.map(x => bigToInt(x, "W"))
        case _ => throw new IllegalArgumentException("pdf: /W")
      }
      val size = bigToInt(dict.m("Size"), "Size")
      val index: Seq[(Int, Int)] = dict.m.get("Index") match {
        case Some(PArr(xs)) => xs.map(x => bigToInt(x, "Index")).grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
        case _ => Seq((0, size))
      }
      val rowLen = w.sum
      var p = 0
      def field(width: Int): Long = {
        var acc = 0L
        (0 until width).foreach { _ => acc = (acc << 8) | (data(p) & 0xff); p += 1 }
        acc
      }
      index.foreach { case (start, count) =>
        (0 until count).foreach { k =>
          if (p + rowLen <= data.length) {
            val t = if (w(0) == 0) 1L else field(w(0))
            val f2 = field(w(1))
            val f3 = field(w(2))
            val num = start + k
            if (!entries.contains(num)) t match {
              case 1L => entries(num) = Left(f2)
              case 2L => entries(num) = Right((f2.toInt, f3.toInt))
              case _ => () // type 0 = free; unknown types are no-ops per spec
            }
          }
        }
      }
      dict
    }

    /** Follow the startxref → /Prev chain (cycle-guarded), absorbing
      * hybrid-reference `/XRefStm` side streams. */
    def loadXrefChain(start: Long): Unit = {
      var pos: Option[Long] = Some(start)
      val seen = scala.collection.mutable.Set[Long]()
      while (pos.isDefined) {
        val p = pos.get
        if (p < 0 || p >= raw.length || !seen.add(p)) pos = None
        else {
          val lex = new PdfLex(raw, p.toInt); lex.ws()
          val trailer = if (raw.startsWith("xref", lex.i)) classicXref(lex.i) else xrefStream(lex.i)
          if (rootRef.isEmpty) trailer.m.get("Root").foreach {
            case r: PRef => rootRef = Some(r)
            case _ => ()
          }
          if (trailer.m.contains("Encrypt")) isEncrypted = true
          // hybrid-reference file: the classic trailer points at a
          // parallel xref stream holding the ObjStm entries
          trailer.m.get("XRefStm").foreach {
            case PNum(x) if seen.add(x.toLong) => xrefStream(x.toInt)
            case _ => ()
          }
          pos = trailer.m.get("Prev").collect { case PNum(x) => x.toLong }
        }
      }
    }

    /** Page-tree walk (depth- and cycle-guarded) → per-page decoded
      * text, tree order. Multiple /Contents streams concatenate with a
      * newline (the spec treats them as one stream with whitespace
      * between). */
    def pageTexts(): Seq[String] = {
      val root = resolve(rootRef.getOrElse(throw new IllegalArgumentException("pdf: no /Root")))
      val pagesV = root match {
        case PDict(m) => m.getOrElse("Pages", throw new IllegalArgumentException("pdf: no /Pages"))
        case _ => throw new IllegalArgumentException("pdf: /Root not dict")
      }
      val out = scala.collection.mutable.ArrayBuffer[String]()
      val visited = scala.collection.mutable.Set[Int]()
      def contentBytes(v: PVal): Array[Byte] = v match {
        case PRef(n) => obj(n)._2.getOrElse(Array.emptyByteArray)
        case PArr(xs) =>
          xs.map(contentBytes).filter(_.nonEmpty)
            .reduceOption((a, b) => a ++ "\n".getBytes(UTF_8) ++ b).getOrElse(Array.emptyByteArray)
        case _ => Array.emptyByteArray
      }
      // /Resources is INHERITABLE down the page tree (PDF 32000-1
      // §7.7.3.4): fonts found on an ancestor /Pages node apply to
      // every descendant page unless shadowed by the page's own
      // resource of the same name. A font whose ToUnicode stream
      // fails to parse contributes no CMap (heuristic decode), never
      // a document failure.
      def fontsOf(m: Map[String, PVal],
                  inherited: Map[String, ToUnicodeCMap]): Map[String, ToUnicodeCMap] = {
        val own = resolve(m.getOrElse("Resources", PNullV)) match {
          case PDict(res) => resolve(res.getOrElse("Font", PNullV)) match {
            case PDict(fd) => fd.flatMap { case (fname, fv) =>
              (resolve(fv) match {
                case PDict(f) => f.get("ToUnicode").flatMap { tu =>
                  (tu match {
                    case PRef(nn) => scala.util.Try(obj(nn)._2).toOption.flatten
                    case _ => None
                  }).flatMap(b => scala.util.Try(
                    parseToUnicode(new String(b, ISO_8859_1))).toOption)
                }
                case _ => None
              }).map(fname -> _)
            }
            case _ => Map.empty[String, ToUnicodeCMap]
          }
          case _ => Map.empty[String, ToUnicodeCMap]
        }
        inherited ++ own
      }
      def walk(v: PVal, depth: Int, fonts: Map[String, ToUnicodeCMap]): Unit = {
        if (depth > 32) throw new IllegalArgumentException("pdf: page tree too deep")
        v match { case PRef(n) if !visited.add(n) => return; case _ => () }
        resolve(v) match {
          case PDict(m) if m.get("Type").contains(PName("Page")) || (m.contains("Contents") && !m.contains("Kids")) =>
            out += decodeContentOps(
              // ISO-8859-1 decode is BYTE-TRANSPARENT (char i == byte i):
              // a CID literal show-string's code bytes >= 0x80 must
              // survive to the CMap lookup; UTF-8 would fold invalid
              // sequences into U+FFFD and produce WRONG codes. Non-CID
              // literal strings keep Latin-1 byte semantics — the same
              // default decodeHexShow falls back to.
              new String(contentBytes(m.getOrElse("Contents", PNullV)), ISO_8859_1),
              fontsOf(m, fonts))
          case PDict(m) =>
            m.get("Kids") match {
              case Some(k) => resolve(k) match {
                case PArr(kids) =>
                  val f = fontsOf(m, fonts)
                  kids.foreach(walk(_, depth + 1, f))
                case _ => ()
              }
              case None => ()
            }
          case _ => ()
        }
      }
      walk(pagesV, 0, Map.empty)
      out.toSeq
    }
  }

  /** Xref-driven parse: startxref → xref chain → page tree. Page
    * numbers are TREE positions (empty pages keep their slot for the
    * numbering but emit no row — same surface as the linear scan on
    * fully-textual documents). */
  private def parsePdfXref(bytes: Array[Byte], raw: String): Option[Seq[PdfPage]] = {
    val sx = raw.lastIndexOf("startxref")
    if (sx < 0) return None
    val lex = new PdfLex(raw, sx + "startxref".length)
    val off = lex.keyword().toLong
    val doc = new PdfDoc(bytes, raw)
    doc.loadXrefChain(off)
    val texts = doc.pageTexts()
    val pages = texts.zipWithIndex.collect { case (t, i) if t.nonEmpty => PdfPage(i + 1, t) }
    if (pages.isEmpty) None else Some(pages)
  }

  /** Pull every content stream out of the raw PDF (document order), via
    * the `/Length` entry when present, falling back to an `endstream`
    * scan; inflate FlateDecode streams. Returns None unless the bytes
    * start with `%PDF` and at least one stream decodes. This is the
    * DAMAGED-FILE path: [[parsePdf]] tries the xref-driven reader first
    * and lands here only when the cross-reference data is missing,
    * truncated, or lies about offsets. */
  private def parsePdfLinear(bytes: Array[Byte], raw: String): Option[Seq[PdfPage]] = {
        val pages = scala.collection.mutable.ArrayBuffer[String]()
        var from = 0
        var keep = true
        while (keep) {
          val si = raw.indexOf("stream", from)
          if (si < 0) keep = false
          else {
            val dictStart = raw.lastIndexOf("<<", si)
            val dict = if (dictStart >= 0) raw.substring(dictStart, si) else ""
            var dataStart = si + "stream".length
            if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
            if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
            // an INDIRECT length (`/Length 12 0 R`) must not match as 12
            // — fall through to the endstream scan for those. (?!\d)
            // pins the digit run so backtracking can't shorten it past
            // the ref lookahead
            val len = "/Length\\s+(\\d+)(?!\\d)(?!\\s+\\d+\\s+R)".r
              .findFirstMatchIn(dict).map(_.group(1).toInt)
            val dataEnd = len.map(dataStart + _)
              .getOrElse { val e = raw.indexOf("endstream", dataStart); if (e < 0) raw.length else e }
            val data = java.util.Arrays.copyOfRange(bytes, dataStart, math.min(dataEnd, bytes.length))
            val decoded =
              if (dict.contains("/FlateDecode")) inflate(data)
              else data
            // byte-transparent decode, same rationale as the xref path
            val text = decodeContentOps(new String(decoded, ISO_8859_1))
            if (text.nonEmpty) pages += text
            // advance PAST the endstream keyword — "endstream" itself
            // contains "stream", so a shorter hop would re-match it
            val es = raw.indexOf("endstream", dataStart)
            from = if (es < 0) raw.length else es + "endstream".length
          }
        }
    if (pages.isEmpty) None
    else Some(pages.toSeq.zipWithIndex.map { case (t, i) => PdfPage(i + 1, t) })
  }

  /** Parse a PDF to its page texts: xref-driven (classic tables, PDF
    * 1.5+ xref/object streams, hybrids — see [[PdfDoc]]) with the
    * linear stream scan as the damaged-file fallback. Returns None
    * unless the bytes start with `%PDF` and at least one page yields
    * text. */
  def parsePdf(bytes: Array[Byte]): Option[Seq[PdfPage]] =
    try {
      val raw = new String(bytes, ISO_8859_1)
      if (!raw.startsWith("%PDF")) None
      // EXPLICIT encryption check, before any decode attempt: without it
      // the "encrypted → None, never wrong text" invariant held only by
      // luck — an encrypted file whose xref read failed would fall into
      // the linear scan, which happily inflates/echoes CIPHERTEXT as
      // page text. [[pdfEncrypted]] is the validator surface for the
      // same signal (error code "encrypted").
      else if (pdfEncrypted(bytes)) None
      else {
        val viaXref =
          try parsePdfXref(bytes, raw)
          catch { case scala.util.control.NonFatal(_) => None }
        viaXref.orElse(parsePdfLinear(bytes, raw))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Is this PDF encrypted (trailer /Encrypt — PDF 32000-1 §7.6)? The
    * xref-chain walk reads the real trailer dict(s); a file whose xref
    * is damaged falls back to a conservative textual probe for the
    * `/Encrypt` key (over-reporting on a damaged file is the safe side:
    * the reader would refuse it anyway, and the validator names WHY).
    * The reference reads encrypted PDFs transparently via PyMuPDF
    * (`document_processing_service.py:156-185`); this engine's
    * documented exclusion surfaces them as a counted P2 validation
    * error instead of silent absence. */
  def pdfEncrypted(bytes: Array[Byte]): Boolean =
    try {
      val raw = new String(bytes, ISO_8859_1)
      if (!raw.startsWith("%PDF")) false
      else {
        val viaTrailer: Option[Boolean] =
          try {
            val sx = raw.lastIndexOf("startxref")
            if (sx < 0) None
            else {
              val lex = new PdfLex(raw, sx + "startxref".length)
              val doc = new PdfDoc(bytes, raw)
              doc.loadXrefChain(lex.keyword().toLong)
              Some(doc.isEncrypted)
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        viaTrailer.getOrElse(raw.contains("/Encrypt"))
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  // ---- PDF tables (S5-lite) --------------------------------------------

  /** One detected table, mirroring the reference's pdfplumber surface
    * (`document_processing_service.py:187-239`: per-page
    * `extract_tables()` → first row = headers, rest = data rows). */
  case class PdfTable(page: Int, table_idx: Int,
                      headers: Seq[String], rows: Seq[Seq[String]])

  /** S5-lite column-alignment table detector over an extracted page's
    * text layer. pdfplumber clusters words by x-coordinate; a JDK-only
    * text layer has no coordinates, so the stand-in alignment signal is
    * runs of 2+ spaces (what fixed-pitch tabular layout leaves in the
    * extracted text). A maximal run of consecutive lines that each split
    * into ≥2 cells is a table when it spans ≥ `minRows` lines; the first
    * line is the header row (pdfplumber's convention in the reference).
    * Ragged rows are right-padded with "" to the block's max width —
    * without x-coords a short row's missing column position is unknowable
    * (pdfplumber would place it by coordinate), so the pad goes at the
    * end; deterministic either way. */
  private[graft] def detectTables(pageText: String, minRows: Int = 2): Seq[(Seq[String], Seq[Seq[String]])] = {
    val cells: Array[Seq[String]] = pageText.split("\n", -1).map { l =>
      val t = l.trim
      if (t.isEmpty) Seq.empty[String] else t.split("\\s{2,}").toSeq
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Seq[Seq[String]])]
    var i = 0
    while (i < cells.length) {
      if (cells(i).length >= 2) {
        var j = i
        while (j < cells.length && cells(j).length >= 2) j += 1
        val block = cells.slice(i, j).toSeq
        if (block.length >= minRows) {
          val ncols = block.map(_.length).max
          val padded = block.map(r => r.padTo(ncols, ""))
          out += ((padded.head, padded.tail))
        }
        i = j
      } else i += 1
    }
    out.toSeq
  }

  /** Parse a PDF straight to its detected tables (S5 surface feeding C3). */
  def parsePdfTables(bytes: Array[Byte]): Option[Seq[PdfTable]] =
    parsePdf(bytes).map(_.flatMap { p =>
      detectTables(p.text).zipWithIndex.map { case ((h, rs), ti) =>
        PdfTable(p.page, ti, h, rs)
      }
    })

  // ---- DOCX tables (structured C3 input) -------------------------------

  /** Structured form of a `w:tbl` — same headers/rows shape as
    * [[PdfTable]], so both feed [[Chunking.tableToText]] (C3). */
  case class DocxTable(table_idx: Int, headers: Seq[String], rows: Seq[Seq[String]])

  /** Re-walk the DOCX body emitting tables as structured rows (first
    * `w:tr` = header row) instead of the flattened text [[parseDocx]]
    * produces for the S8 chunk stream. */
  def parseDocxTables(bytes: Array[Byte]): Option[Seq[DocxTable]] =
    try {
      readZipEntry(bytes, "word/document.xml").map { xml =>
        val doc = parseXml(xml)
        val body = childElems(doc.getDocumentElement)
          .find(_.getLocalName == "body")
          .getOrElse(throw new IllegalArgumentException("no w:body"))
        childElems(body).filter(_.getLocalName == "tbl").zipWithIndex.map {
          case (tbl, tIdx) =>
            val rows = childElems(tbl).filter(_.getLocalName == "tr").map { tr =>
              childElems(tr).filter(_.getLocalName == "tc").map { tc =>
                childElems(tc).filter(_.getLocalName == "p")
                  .map(paraText).mkString("\n").trim
              }
            }
            DocxTable(tIdx, rows.headOption.getOrElse(Seq.empty),
              if (rows.isEmpty) Seq.empty else rows.tail)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- Spark surface ---------------------------------------------------

  val docxChunksUdf = udf((bytes: Array[Byte]) => parseDocx(bytes))
  val pdfTablesUdf = udf((bytes: Array[Byte]) => parsePdfTables(bytes))
  val docxTablesUdf = udf((bytes: Array[Byte]) => parseDocxTables(bytes))
  val emlChunksUdf = udf((bytes: Array[Byte]) => parseEml(bytes).map(emlChunks(_)))
  val pdfPagesUdf = udf((bytes: Array[Byte]) => parsePdf(bytes))
  val validDocxUdf = udf((bytes: Array[Byte]) => parseDocx(bytes).isDefined)
  val validEmlUdf = udf((bytes: Array[Byte]) => parseEml(bytes).isDefined)
  val validPdfUdf = udf((bytes: Array[Byte]) => parsePdf(bytes).isDefined)
  val pdfEncryptedUdf = udf((bytes: Array[Byte]) => pdfEncrypted(bytes))

  /** The fixture corpus as a (doc, fmt, content BINARY) frame — the same
    * shape a `binaryFile` scan of a staging directory produces. */
  def fixturesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DocFixtures.all.toDF("doc", "fmt", "content")
  }

  /** The PDF 1.5+ fixture corpus (xref stream + object streams) — kept
    * separate from [[fixturesDF]] so the classic VALUES oracles stay
    * untouched; see [[DocFixtures.pdfBytesXrefStream]]. */
  def xrefFixturesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DocFixtures.xrefAll.toDF("doc", "fmt", "content")
  }

  /** The composite-font (CID + ToUnicode) fixture corpus — see
    * [[DocFixtures.pdfBytesCid]]. */
  def cidFixturesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DocFixtures.cidAll.toDF("doc", "fmt", "content")
  }

  /** S8 surface: one row per DOCX chunk, reference chunk-id scheme
    * `{stem}_para_{idx}` / `{stem}_table_{idx}`. */
  def docxChunks(docs: DataFrame, docCol: String = "doc",
                 binCol: String = "content"): DataFrame =
    docs.select(col(docCol).as("doc"),
        explode(docxChunksUdf(col(binCol))).as("c"))
      .select(col("doc"),
        concat(col("doc"),
          when(col("c.chunk_type") === "table", lit("_table_")).otherwise(lit("_para_")),
          col("c.chunk_idx")).as("chunk_id"),
        col("c.chunk_type").as("chunk_type"),
        col("c.section_title").as("section_title"),
        col("c.style").as("style"),
        col("c.content").as("content"))

  /** S9 surface: headers chunk + body paragraph chunks per message. */
  def emlChunksDF(docs: DataFrame, docCol: String = "doc",
                  binCol: String = "content"): DataFrame =
    docs.select(col(docCol).as("doc"),
        explode(emlChunksUdf(col(binCol))).as("c"))
      .select(col("doc"),
        when(col("c.chunk_type") === "headers", concat(col("doc"), lit("_headers")))
          .otherwise(concat(col("doc"), lit("_body_"), col("c.chunk_idx"))).as("chunk_id"),
        col("c.chunk_type").as("chunk_type"),
        col("c.content").as("content"))

  /** S4 surface: one row per non-empty PDF page. */
  def pdfPages(docs: DataFrame, docCol: String = "doc",
               binCol: String = "content"): DataFrame =
    docs.select(col(docCol).as("doc"),
        explode(pdfPagesUdf(col(binCol))).as("p"))
      .select(col("doc"), col("p.page").as("page"), col("p.text").as("content"),
        length(col("p.text")).as("n_chars"))

  /** S5 surface: one row per detected PDF table, pdfplumber's per-page
    * shape (`headers ARRAY<STRING>`, `rows ARRAY<ARRAY<STRING>>`). */
  def pdfTables(docs: DataFrame, docCol: String = "doc",
                binCol: String = "content"): DataFrame =
    docs.select(col(docCol).as("doc"),
        explode(pdfTablesUdf(col(binCol))).as("t"))
      .select(col("doc"), col("t.page").as("page"),
        col("t.table_idx").as("table_idx"),
        col("t.headers").as("headers"), col("t.rows").as("rows"))

  /** Structured DOCX-table surface (same shape, page fixed at 0). */
  def docxTables(docs: DataFrame, docCol: String = "doc",
                 binCol: String = "content"): DataFrame =
    docs.select(col(docCol).as("doc"),
        explode(docxTablesUdf(col(binCol))).as("t"))
      .select(col("doc"), lit(0).as("page"),
        col("t.table_idx").as("table_idx"),
        col("t.headers").as("headers"), col("t.rows").as("rows"))

  /** S10 surface: per-format validator verdict for every fixture, plus
    * a P2 error code naming WHY a document was rejected — `encrypted`
    * for password-protected PDFs (a corpus report must be able to COUNT
    * them; the reference reads them transparently, this engine
    * documents them out of scope), `parse_failed` for everything else
    * invalid, NULL for valid documents. */
  def validateAll(docs: DataFrame): DataFrame =
    docs.select(col("doc"), col("fmt"), col("content"),
        when(col("fmt") === "docx", validDocxUdf(col("content")))
          .when(col("fmt") === "eml", validEmlUdf(col("content")))
          .when(col("fmt") === "pdf", validPdfUdf(col("content")))
          .otherwise(lit(false)).as("is_valid"))
      .select(col("doc"), col("fmt"), col("is_valid"),
        when(col("is_valid"), lit(null).cast("string"))
          .when(col("fmt") === "pdf" && pdfEncryptedUdf(col("content")),
            lit("encrypted"))
          .otherwise(lit("parse_failed")).as("error"))
}
