package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.operators.Ocr

/** S6-lite OCR: the recognizer only meets the renderer through real
  * encoded-then-decoded PNG bytes, so these are genuine image→text
  * round trips. */
class OcrSpec extends SparkSpec {

  test("recognizes every fixture page exactly") {
    val got = Ocr.ocrLines(Ocr.fixturesDF(spark)).collect()
      .map(l => (l.doc, l.page, l.line_no) -> l.text).toMap
    assert(got == Map(
      ("scan1", 1, 1) -> "CLAIM FORM 7",
      ("scan1", 1, 2) -> "POLICY NO 42",
      ("scan1", 2, 1) -> "TOTAL DUE 1350",
      ("scan2", 1, 1) -> "HELLO WORLD"))
  }

  test("full charset survives the render-encode-decode-recognize loop") {
    val lines = Seq("ABCDEFGHIJKLM", "NOPQRSTUVWXYZ", "0123456789")
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("all", 1, Ocr.renderPng(lines))).toDF("doc", "page", "payload")
    val got = Ocr.ocrLines(df).collect().sortBy(_.line_no).map(_.text).toSeq
    assert(got == lines)
  }

  test("unknown glyph recognizes as ? instead of failing the page") {
    // hand-draw a 5x7 checkerboard (not in the font) next to an 'A'
    val img = new BufferedImage(17, 11, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 11; x <- 0 until 17) img.setRGB(x, y, 0xFFFFFF)
    for (gy <- 0 until 7; gx <- 0 until 5 if Ocr.font('A')(gy)(gx) == '#')
      img.setRGB(2 + gx, 2 + gy, 0x000000)
    for (gy <- 0 until 7; gx <- 0 until 5 if (gx + gy) % 2 == 0)
      img.setRGB(8 + gx, 2 + gy, 0x000000)
    val out = new ByteArrayOutputStream(); ImageIO.write(img, "png", out)
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("x", 1, out.toByteArray)).toDF("doc", "page", "payload")
    val got = Ocr.ocrLines(df).collect()
    assert(got.length == 1 && got.head.text == "A?")
  }

  test("undecodable payloads drop silently") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("junk", 1, Array[Byte](9, 9, 9))).toDF("doc", "page", "payload")
    assert(Ocr.ocrLines(df).collect().isEmpty)
  }
}
