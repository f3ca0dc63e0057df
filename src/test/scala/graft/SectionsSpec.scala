package graft

import org.apache.spark.sql.functions._
import graft.operators.Sections

class SectionsSpec extends SparkSpec {
  import spark.implicits._

  private val doc =
    """intro line one
      |intro line two
      |DEFINITIONS AND TERMS:
      |term a
      |term b
      |1. Coverage Details:
      |covered stuff
      |Section 2: Exclusions
      |more text
      |(a) Premium Payment
      |paid monthly""".stripMargin

  test("C1 groups lines into sections with an Introduction preamble") {
    val out = Sections.sectionChunks(Seq((1L, doc)).toDF("doc_id", "text"))
      .orderBy("section_idx").collect()
    assert(out.map(_.getAs[String]("section_title")).toSeq ===
      Seq("Introduction", "DEFINITIONS AND TERMS:", "1. Coverage Details:",
        "Section 2: Exclusions", "(a) Premium Payment"))
    assert(out.head.getAs[String]("content") === "intro line one\nintro line two")
    assert(out(1).getAs[String]("content") === "term a\nterm b")
    assert(out(3).getAs[String]("content") === "more text")
    assert(out(4).getAs[String]("content") === "paid monthly")
    assert(out.map(_.getAs[String]("chunk_id")).toSeq ===
      Seq("1_s0", "1_s1", "1_s2", "1_s3", "1_s4"))
  }

  test("C1 header shapes match the reference's four regexes, no looser") {
    import org.apache.spark.sql.Row
    val cases = Seq(
      // reference-shape headers (document_processing_service.py:311-316)
      "COVERAGE:" -> true, "DEFINITIONS AND TERMS:" -> true,
      "1. Coverage Details:" -> true, "Section 1: Coverage Details" -> true,
      "Article 3. General Terms" -> true, "(a) Premium Payment" -> true,
      // near-misses the tightened patterns must reject
      "1. lowercase item." -> false,   // numbered but no capital / colon
      "1. Coverage Details" -> false,  // numbered, capitalized, missing colon
      "(a) lowercase start" -> false,  // sub-clause without capital
      "Section 2" -> false,            // word+number but no [.:] + title
      "POLICY NO 42:" -> false,        // digits break the ALL-CAPS shape
      "plain body text" -> false)
    val got = Sections
      .isHeader(col("line")).as("h")
    val out = cases.map(_._1).toDF("line").select(col("line"), got)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (line, want) =>
      assert(out(line) === want, s"isHeader($line)") }
  }

  test("C1 drops header-only sections with empty bodies") {
    val out = Sections.sectionChunks(
      Seq((1L, "HEADER ONE:\nHEADER TWO:\nbody")).toDF("doc_id", "text")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("section_title") === "HEADER TWO:")
  }

  test("C9 embed text prefixes titles and truncates to maxChars") {
    val chunks = Seq(("T:", "body " * 100), ("T:", "contains T: here"))
      .toDF("section_title", "content")
    val out = Sections.embedText(chunks, maxChars = 20)
      .select("embed_text").as[String].collect()
    assert(out(0) === ("T:\n\n" + "body " * 100).take(20))
    assert(out(1) === "contains T: here")
  }

  test("S7 strategy fallback picks primary only when long enough") {
    val docs = Seq((1L, Seq.fill(50)("w").mkString(" ")), (2L, "too short"))
      .toDF("doc_id", "text")
    val out = Sections.extractWithFallback(docs, col("text"),
        upper(substring(col("text"), 1, 120)), minWords = 40)
      .orderBy("doc_id").select("strategy", "extracted_text").collect()
    assert(out(0).getString(0) === "primary")
    assert(out(1).getString(0) === "fallback")
    assert(out(1).getString(1) === "TOO SHORT")
  }
}
