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
  * the PDF reader handles the dominant real-world shape — FlateDecode
  * content streams with `Tj`/`TJ`/`'` show operators (`Inflater` is in
  * the JDK). Exotic PDFs (CID fonts, object streams, encryption) are
  * out of scope and yield no pages rather than wrong text.
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
  private[graft] def decodeContentOps(ops: String): String = {
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
    while (i < n) {
      val c = ops.charAt(i)
      if (c == '(') lastStrings += readString()
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
          case _ => () // Tf, numbers handled below, other ops ignored
        }
      } else i += 1
    }
    if (cur.nonEmpty) lines += cur.toString
    lines.mkString("\n")
  }

  /** Pull every content stream out of the raw PDF (document order), via
    * the `/Length` entry when present, falling back to an `endstream`
    * scan; inflate FlateDecode streams. Returns None unless the bytes
    * start with `%PDF` and at least one stream decodes. */
  def parsePdf(bytes: Array[Byte]): Option[Seq[PdfPage]] =
    try {
      val raw = new String(bytes, ISO_8859_1)
      if (!raw.startsWith("%PDF")) None
      else {
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
            val len = "/Length\\s+(\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toInt)
            val dataEnd = len.map(dataStart + _)
              .getOrElse { val e = raw.indexOf("endstream", dataStart); if (e < 0) raw.length else e }
            val data = java.util.Arrays.copyOfRange(bytes, dataStart, math.min(dataEnd, bytes.length))
            val decoded =
              if (dict.contains("/FlateDecode")) inflate(data)
              else data
            val text = decodeContentOps(new String(decoded, UTF_8))
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
    } catch { case scala.util.control.NonFatal(_) => None }

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

  /** The fixture corpus as a (doc, fmt, content BINARY) frame — the same
    * shape a `binaryFile` scan of a staging directory produces. */
  def fixturesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DocFixtures.all.toDF("doc", "fmt", "content")
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

  /** S10 surface: per-format validator verdict for every fixture. */
  def validateAll(docs: DataFrame): DataFrame =
    docs.select(col("doc"), col("fmt"),
      when(col("fmt") === "docx", validDocxUdf(col("content")))
        .when(col("fmt") === "eml", validEmlUdf(col("content")))
        .when(col("fmt") === "pdf", validPdfUdf(col("content")))
        .otherwise(lit(false)).as("is_valid"))
}
