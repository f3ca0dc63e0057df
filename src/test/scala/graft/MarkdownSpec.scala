package graft

import graft.operators.Markdown
import graft.operators.Markdown.MdBlock

/** Edge semantics for the markdown extractor: the `md_extract` oracle
  * pins the golden document; these pin the corners hostile or sloppy
  * input hits (unclosed fences, CRLF, marker-without-space, heading
  * overflow, inline cleaning never touching code). */
class MarkdownSpec extends SparkSpec {

  private def kinds(md: String) = Markdown.parseMarkdown(md).map(b => (b.kind, b.content))

  test("unclosed fence runs to end of input, content verbatim") {
    val out = Markdown.parseMarkdown("```py\nx = [a](b)\nstill code")
    assert(out === Seq(MdBlock(0, "code", 0, "py", "x = [a](b)\nstill code")))
  }

  test("CRLF input: trailing \\r never leaks into content") {
    val out = Markdown.parseMarkdown("# H\r\n\r\npara one\r\nline two\r\n")
    assert(out === Seq(
      MdBlock(0, "heading", 1, "", "H"),
      MdBlock(1, "para", 0, "", "para one line two")))
  }

  test("marker without the space is not structure") {
    // '#notitle' is a hashtag, '-dash' a word, '1.x' a number: all paras
    assert(kinds("#notitle") === Seq(("para", "#notitle")))
    assert(kinds("-dash joined") === Seq(("para", "-dash joined")))
    assert(kinds("1.x versions") === Seq(("para", "1.x versions")))
  }

  test("seven hashes is a paragraph; trailing hashes strip from real headings") {
    assert(kinds("####### too deep") === Seq(("para", "####### too deep")))
    assert(Markdown.parseMarkdown("### Three ###").head ===
      MdBlock(0, "heading", 3, "", "Three"))
  }

  test("an invalid '#' line joins the open paragraph instead of splitting it") {
    // the scaladoc rule: non-structure lines join into ONE para block —
    // an invalid heading must not flush the accumulator mid-paragraph
    assert(kinds("first line\n#hashtag here\nlast line") ===
      Seq(("para", "first line #hashtag here last line")))
    assert(kinds("open\n####### deep\nclose") ===
      Seq(("para", "open ####### deep close")))
  }

  test("inline cleaning: images, links, code spans, emphasis; blanks split paras") {
    assert(kinds("See ![alt text](img.png) and **b** _i_ `c()` now.") ===
      Seq(("para", "See alt text and b i c() now.")))
    assert(kinds("one\n\ntwo") === Seq(("para", "one"), ("para", "two")))
    // intra-word underscores survive (snake_case is not emphasis)
    assert(kinds("use snake_case here") === Seq(("para", "use snake_case here")))
  }

  test("quote and list runs break correctly against each other") {
    val out = kinds("> q1\n- item\n> q2")
    assert(out === Seq(("quote", "q1"), ("list", "item"), ("quote", "q2")))
  }

  test("empty, blank-only, and null-free inputs behave") {
    assert(Markdown.parseMarkdown("") === Seq.empty)
    assert(Markdown.parseMarkdown("\n\n  \n") === Seq.empty)
  }

  test("markdownSections: most-recent-heading grouping at any level") {
    import spark.implicits._
    val md = "pre\n\n# A\n\npa\n\n### Deep\n\npd\n\n## B\n\npb1\n\npb2"
    val out = Markdown.markdownSections(Seq(("d", md)).toDF("doc", "text"))
      .collect().map(r => r.getLong(1) -> ((r.getString(2), r.getString(3), r.getLong(4))))
      .toMap
    assert(out(0L) === (("", "pre", 1L)))
    assert(out(1L) === (("A", "pa", 1L)))
    assert(out(2L) === (("Deep", "pd", 1L))) // deeper heading still owns its blocks
    assert(out(3L) === (("B", "pb1\npb2", 2L)))
    // a heading with no body contributes NO section row (nothing to chunk)
    val empty = Markdown.markdownSections(Seq(("d", "# Lone")).toDF("doc", "text"))
    assert(empty.count() === 0)
  }

  test("fuzz: 500 random marker soups never throw, indices stay contiguous") {
    val rnd = new scala.util.Random(99)
    val frags = Array("#", "##", " ", "\n", "\n\n", "-", "*", "+", "1.", "2)",
      ">", "```", "~~~", "`", "[", "]", "(", ")", "!", "**", "_", "~~", "word",
      "x", "\t", "\r\n", "scala", "text here")
    val kinds = Set("heading", "para", "code", "list", "quote")
    (1 to 500).foreach { _ =>
      val md = (0 until rnd.nextInt(40))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString
      val out = Markdown.parseMarkdown(md)
      assert(out.map(_.block_idx) === out.indices)
      out.foreach { b =>
        assert(kinds(b.kind), s"bad kind ${b.kind} for <$md>")
        assert(b.kind == "code" || b.content.nonEmpty)
        assert(b.kind != "heading" || (b.level >= 1 && b.level <= 6))
      }
    }
  }

  test("markdownBlocks: null text yields no rows, not a failed task") {
    import spark.implicits._
    val df = Seq(("a", "# ok"), ("b", null)).toDF("doc", "text")
    val rows = Markdown.markdownBlocks(df).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a"))
  }
}
