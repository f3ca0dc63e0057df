package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, Deflater, ZipEntry, ZipOutputStream}

/** Deterministic in-memory document fixtures for the S4/S8/S9 extractors
  * ([[DocExtract]]) — real container formats built with nothing but the
  * JDK, so the parse path under test is the same one a
  * `spark.read.format("binaryFile")` scan would feed at scale.
  *
  * The CONTENT constants below are the single source of truth: the
  * DuckDB oracles in `SparkEntry.oracleSql` state the expected parse
  * results as literal VALUES derived (by hand) from these constants, so
  * a drift in either the builder or the extractor breaks the hash
  * compare.
  */
object DocFixtures {

  // ---- DOCX ------------------------------------------------------------

  /** (text, styleId) body paragraphs of the `policy` fixture, in
    * document order. Index 2 is deliberately empty: the reference
    * enumerates ALL paragraphs for chunk ids but emits only non-blank
    * ones (`document_processing_service.py:390-408`), so `para_2` must
    * be skipped while `para_3` keeps its index. */
  val policyParas: Seq[(String, Option[String])] = Seq(
    ("Coverage Policy", Some("Heading1")),
    ("This policy covers accidental damage to insured property.", None),
    ("", None),
    ("Exclusions", Some("Heading2")),
    ("Damage caused by war or nuclear events is excluded.", None),
    ("Contact support for claims.", None))

  /** Rows (first = header row) of the `policy` fixture's one table. */
  val policyTable: Seq[Seq[String]] = Seq(
    Seq("Item", "Limit"), Seq("Laptop", "1000"), Seq("Phone", "500"))

  val memoParas: Seq[(String, Option[String])] = Seq(
    ("Quarterly results improved.", None),
    ("Next Steps", Some("Heading1")),
    ("Hire two engineers.", None))

  private def xmlEsc(s: String) =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Minimal WordprocessingML: one `w:p` per paragraph (split into two
    * `w:r` runs when the text has a space, to exercise run
    * concatenation), `w:tbl` per table. */
  private def documentXml(paras: Seq[(String, Option[String])],
                          tables: Seq[Seq[Seq[String]]]): String = {
    val ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    def runs(text: String): String = {
      val cut = text.indexOf(' ')
      if (cut < 0) s"<w:r><w:t xml:space=\"preserve\">${xmlEsc(text)}</w:t></w:r>"
      else s"<w:r><w:t xml:space=\"preserve\">${xmlEsc(text.substring(0, cut + 1))}</w:t></w:r>" +
        s"<w:r><w:t xml:space=\"preserve\">${xmlEsc(text.substring(cut + 1))}</w:t></w:r>"
    }
    val ps = paras.map { case (text, style) =>
      val pr = style.map(s => s"<w:pPr><w:pStyle w:val=\"$s\"/></w:pPr>").getOrElse("")
      val body = if (text.isEmpty) "" else runs(text)
      s"<w:p>$pr$body</w:p>"
    }.mkString
    val tbls = tables.map { rows =>
      val trs = rows.map { cells =>
        val tcs = cells.map(c =>
          s"<w:tc><w:p>${runs(c)}</w:p></w:tc>").mkString
        s"<w:tr>$tcs</w:tr>"
      }.mkString
      s"<w:tbl>$trs</w:tbl>"
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      s"""<w:document xmlns:w="$ns"><w:body>$ps$tbls</w:body></w:document>"""
  }

  /** Zip the parts into a valid-enough OOXML container (STORED entries
    * with fixed timestamps — byte-deterministic across runs/JVMs). */
  private def zipBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      val e = new ZipEntry(name)
      e.setMethod(ZipEntry.STORED)
      e.setSize(data.length.toLong)
      val crc = new CRC32(); crc.update(data)
      e.setCrc(crc.getValue)
      e.setTime(0L)
      zos.putNextEntry(e); zos.write(data); zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private val contentTypesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
      """</Types>"""

  def docxBytes(paras: Seq[(String, Option[String])],
                tables: Seq[Seq[Seq[String]]]): Array[Byte] =
    zipBytes(Seq(
      "[Content_Types].xml" -> contentTypesXml.getBytes(UTF_8),
      "word/document.xml" -> documentXml(paras, tables).getBytes(UTF_8)))

  // ---- EML -------------------------------------------------------------

  /** Single-part plain-text message. First body paragraph is ≤ 20 chars
    * so the >20 filter (`document_processing_service.py:522`) drops it
    * while later paragraphs keep their enumeration index. */
  val simpleEml: String = Seq(
    "Return-Path: <alice@example.com>",
    "Subject: Policy renewal",
    "From: alice@example.com",
    "To: bob@example.com",
    "Date: Mon, 01 Jan 2024 10:00:00 +0000",
    "Content-Type: text/plain; charset=utf-8",
    "",
    "Hello Bob,",
    "",
    "Your insurance policy is due for renewal next month. Please review the terms.",
    "",
    "Thanks from the renewals team at Example Insurance.").mkString("\r\n")

  /** Multipart/alternative: a quoted-printable text/plain part, a
    * base64 text/plain part, and a text/html part that the walk must
    * skip. Decoded, the two plain parts concatenate (each ends with a
    * newline) exactly as `msg.walk()` + `get_content()` appends them. */
  val multiEml: String = Seq(
    "MIME-Version: 1.0",
    "Subject: Meeting notes",
    "From: carol@example.com",
    "To: dave@example.com",
    "Date: Tue, 02 Jan 2024 09:30:00 +0000",
    "Content-Type: multipart/alternative; boundary=\"b42\"",
    "",
    "--b42",
    "Content-Type: text/plain; charset=utf-8",
    "Content-Transfer-Encoding: quoted-printable",
    "",
    "Caf=C3=A9 meeting confirmed for Tuesday at noon sharp.",
    "",
    "--b42",
    "Content-Type: text/plain; charset=utf-8",
    "Content-Transfer-Encoding: base64",
    "",
    java.util.Base64.getEncoder.encodeToString(
      "This is a base64 encoded paragraph body.\n".getBytes(UTF_8)),
    "--b42",
    "Content-Type: text/html; charset=utf-8",
    "",
    "<p>HTML body that must NOT appear in the text.</p>",
    "--b42--",
    "").mkString("\r\n")

  // ---- PDF -------------------------------------------------------------

  /** Page texts of the `contract` fixture; page 2's second line is
    * emitted via a TJ array (two string pieces) to exercise that
    * operator. */
  val contractPages: Seq[Seq[String]] = Seq(
    Seq("MASTER SERVICE AGREEMENT",
      "This agreement is made between the parties."),
    Seq("Termination requires thirty days notice.",
      "Signed by both parties."))

  /** Page texts of the `invoice` fixture — each page carries one
    * whitespace-aligned table (columns separated by runs of 2+ spaces,
    * the alignment a fixed-pitch PDF text layer produces) surrounded by
    * prose lines, for the S5-lite table detector. Page 2's line 1 goes
    * through the TJ special case in [[pdfBytes]] like `contract`'s. */
  val invoicePages: Seq[Seq[String]] = Seq(
    Seq("INVOICE 2024-001",
      "Billed to Example Corp for consulting services.",
      "Item      Qty   Price",
      "Widget    2     10.00",
      "Gadget    1     25.50",
      "Assembly  3     45.00",
      "Thank you for your business."),
    Seq("PAYMENT TERMS",
      "Net thirty days from invoice date.",
      "Method    Fee",
      "Wire      0.00",
      "Card      3.50"))

  private def pdfStrEsc(s: String) =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Minimal but structurally valid PDF: catalog → pages → one page +
    * one FlateDecode content stream per page, cross-reference table and
    * trailer included. Page 2 exercises the TJ (array-show) operator. */
  def pdfBytes(pages: Seq[Seq[String]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets_ISO))
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def beginObj(n: Int): Unit = { offsets += out.size(); w(s"$n 0 obj\n") }

    val nPages = pages.size
    val pageObjNums = (0 until nPages).map(i => 3 + 2 * i)
    w("%PDF-1.4\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    w(s"<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] /Count $nPages >>\nendobj\n")
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageNum = pageObjNums(i)
      beginObj(pageNum)
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents ${pageNum + 1} 0 R >>\nendobj\n")
      val ops = new StringBuilder("BT /F1 12 Tf 72 720 Td ")
      lines.zipWithIndex.foreach { case (line, li) =>
        if (li > 0) ops.append("T* ")
        if (li == 1 && line.contains(' ') && i == pages.size - 1) {
          // TJ: split into two pieces with a kerning number between
          val cut = line.indexOf(' ') + 1
          ops.append(s"[(${pdfStrEsc(line.substring(0, cut))}) -20 (${pdfStrEsc(line.substring(cut))})] TJ ")
        } else ops.append(s"(${pdfStrEsc(line)}) Tj ")
      }
      ops.append("ET")
      val data = deflate(ops.toString.getBytes(UTF_8))
      beginObj(pageNum + 1)
      w(s"<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    val xrefPos = out.size()
    val n = offsets.size + 1
    w(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  private val StandardCharsets_ISO = java.nio.charset.StandardCharsets.ISO_8859_1

  // ---- assembled fixture set ------------------------------------------

  /** (doc, fmt, bytes): the parse-query corpus, including two corrupt
    * members for the validator surface. */
  def all: Seq[(String, String, Array[Byte])] = Seq(
    ("policy", "docx", docxBytes(policyParas, Seq(policyTable))),
    ("memo", "docx", docxBytes(memoParas, Seq.empty)),
    ("simple", "eml", simpleEml.getBytes(UTF_8)),
    ("multi", "eml", multiEml.getBytes(UTF_8)),
    ("contract", "pdf", pdfBytes(contractPages)),
    ("invoice", "pdf", pdfBytes(invoicePages)),
    ("garbage_docx", "docx", Array[Byte](0x50, 0x4b, 0x03, 0x04, 0x00, 0x01, 0x02)),
    ("garbage_pdf", "pdf", "%PDF-1.4 not really a pdf".getBytes(UTF_8)))
}
