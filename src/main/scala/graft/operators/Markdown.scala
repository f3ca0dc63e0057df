package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Markdown extraction — the extractor-family member for the dominant
  * code-adjacent corpus format (READMEs, docs sites, GitHub exports;
  * the reference's extractor set stops at office formats, but a
  * training-data pipeline ingests markdown by the terabyte). JDK-only,
  * single forward line scan, the [[Html]] discipline: deterministic
  * FIXED rules a DuckDB oracle can state as literal VALUES, hostile
  * input degrades to less structure, never to quadratic time.
  *
  * Block rules (CommonMark's common core, documented subset):
  *  - fenced code: a line opening with ``` or ~~~ (after ≤3 spaces of
  *    indent) starts a code block that runs VERBATIM (no inline
  *    cleaning) to the matching closing fence (same character, ≥ the
  *    opening length) or end of input; the info string (language tag)
  *    lands in `level` as 0 and the tag in `lang`;
  *  - ATX headings: `#{1,6} ` → kind `heading`, `level` = the # count,
  *    trailing `#` runs and surrounding spaces stripped;
  *  - blockquote lines (`>` prefix, one optional space eaten) join
  *    into one `quote` block per contiguous run;
  *  - list items: `-`/`*`/`+` + space, or digits + `.`/`)` + space →
  *    one `list` block PER ITEM (marker stripped); a list item's
  *    continuation lines are the documented non-goal (each line
  *    stands alone — less structure, never lost text);
  *  - everything else: contiguous non-blank lines join with a single
  *    space into one `para` block.
  *
  * Inline cleaning (headings/quotes/list/para — never code): images
  * `![alt](url)` → alt, links `[text](url)` → text, inline code
  * `` `x` `` → x, emphasis runs (`**`, `__`, `*`, `_`, `~~`) stripped
  * when they wrap a token boundary; all applied with non-backtracking
  * regexes. Whitespace collapses to single spaces, trimmed.
  *
  * Scale shape: one scalar UDF over the text column — per-row,
  * zero-shuffle; the explode to block rows is a Generate, no join. */
object Markdown {

  case class MdBlock(block_idx: Int, kind: String, level: Int,
                     lang: String, content: String)

  private val linkRe = "!?\\[([^\\]]*)\\]\\([^)]*\\)".r
  private val codeRe = "`([^`]*)`".r

  private def cleanInline(s: String): String = {
    var t = linkRe.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(m.group(1)))
    t = codeRe.replaceAllIn(t, m => java.util.regex.Matcher.quoteReplacement(m.group(1)))
    // emphasis runs: strip marker characters at token boundaries
    t = t.replaceAll("(\\*\\*|__|~~)", "")
    t = t.replaceAll("(?<=^|\\s)[*_]+(?=\\S)", "")
    t = t.replaceAll("(?<=\\S)[*_]+(?=\\s|$)", "")
    t.replaceAll("\\s+", " ").trim
  }

  /** The per-document scan. Never throws on any input: markdown has no
    * invalid documents, only less structure. */
  def parseMarkdown(text: String): Seq[MdBlock] = {
    val out = scala.collection.mutable.ArrayBuffer[MdBlock]()
    val lines = text.split("\n", -1)
    val para = new StringBuilder
    val quote = new StringBuilder
    def flushPara(): Unit = {
      if (para.nonEmpty) {
        val c = cleanInline(para.toString)
        if (c.nonEmpty) out += MdBlock(out.length, "para", 0, "", c)
        para.clear()
      }
    }
    def flushQuote(): Unit = {
      if (quote.nonEmpty) {
        val c = cleanInline(quote.toString)
        if (c.nonEmpty) out += MdBlock(out.length, "quote", 0, "", c)
        quote.clear()
      }
    }
    def flushAll(): Unit = { flushPara(); flushQuote() }
    var i = 0
    while (i < lines.length) {
      val raw = lines(i)
      val line = raw.stripTrailing()
      val lt = line.trim
      val indent = line.length - line.stripLeading().length
      // fence?
      val fenceChar =
        if (indent <= 3 && (lt.startsWith("```") || lt.startsWith("~~~")))
          lt.charAt(0)
        else 0.toChar
      if (fenceChar != 0.toChar) {
        flushAll()
        val fenceLen = lt.takeWhile(_ == fenceChar).length
        val lang = lt.drop(fenceLen).trim.takeWhile(!_.isWhitespace)
        val body = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < lines.length && !closed) {
          val cl = lines(j).trim
          if (cl.forall(_ == fenceChar) && cl.length >= fenceLen && cl.nonEmpty)
            closed = true
          else {
            if (body.nonEmpty) body += '\n'
            body ++= lines(j)
            j += 1
          }
        }
        out += MdBlock(out.length, "code", 0, lang, body.toString)
        i = if (closed) j + 1 else j
      } else if (lt.isEmpty) {
        flushAll()
        i += 1
      } else if (lt.startsWith("#") && {
          // validity BEFORE any flush: '#hashtag' or 7+ hashes is a
          // plain text line and must not split an open paragraph
          val hashes = lt.takeWhile(_ == '#').length
          hashes <= 6 && (lt.length == hashes || lt.charAt(hashes) == ' ')
        }) {
        flushAll()
        val hashes = lt.takeWhile(_ == '#').length
        val t = cleanInline(
          lt.drop(hashes).reverse.dropWhile(c => c == '#' || c == ' ').reverse)
        if (t.nonEmpty) out += MdBlock(out.length, "heading", hashes, "", t)
        i += 1
      } else if (lt.startsWith(">")) {
        flushPara()
        val body = lt.drop(1).stripPrefix(" ")
        if (quote.nonEmpty) quote += ' '
        quote ++= body
        i += 1
      } else {
        val isBullet = lt.length >= 2 &&
          "-*+".indexOf(lt.charAt(0)) >= 0 && lt.charAt(1) == ' '
        val digits = lt.takeWhile(_.isDigit)
        val isOrderedItem = digits.nonEmpty && digits.length + 1 < lt.length &&
          (lt.charAt(digits.length) == '.' || lt.charAt(digits.length) == ')') &&
          lt.charAt(digits.length + 1) == ' '
        if (isBullet || isOrderedItem) {
          flushAll()
          val body = if (isBullet) lt.drop(2) else lt.drop(digits.length + 2)
          val c = cleanInline(body)
          if (c.nonEmpty) out += MdBlock(out.length, "list", 0, "", c)
          i += 1
        } else {
          flushQuote()
          if (para.nonEmpty) para += ' '
          para ++= lt
          i += 1
        }
      }
    }
    flushAll()
    out.toSeq
  }

  val parseMarkdownUdf = udf((text: String) =>
    Option(text).map(parseMarkdown).getOrElse(Seq.empty))

  /** One row per block: (doc, block_idx, kind, level, lang, content). */
  def markdownBlocks(docs: DataFrame, docCol: String = "doc",
                     textCol: String = "text"): DataFrame =
    docs.select(col(docCol).as("doc"),
        explode(parseMarkdownUdf(col(textCol))).as("b"))
      .select(col("doc"), col("b.block_idx").as("block_idx"),
        col("b.kind").as("kind"), col("b.level").as("level"),
        col("b.lang").as("lang"), col("b.content").as("content"))

  /** The bridge into the chunking tier — [[markdownBlocks]] grouped
    * under their governing heading, the [[Sections]] shape for
    * markdown: each block belongs to the most recent heading at ANY
    * level (markdown documents nest loosely; the flat
    * most-recent-heading rule is the C1 splitter's own convention),
    * blocks before the first heading form section 0 with an empty
    * title. Output: (doc, section_idx, title, content, n_blocks) with
    * body blocks joined by newline in document order.
    *
    * Scale shape: the window partitions by DOCUMENT (corpus-keyed,
    * never global) and the regroup is one doc-keyed aggregate. */
  def markdownSections(docs: DataFrame, docCol: String = "doc",
                       textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("block_idx"))
    markdownBlocks(docs, docCol, textCol)
      .withColumn("section_idx",
        sum(when(col("kind") === "heading", 1).otherwise(0)).over(w))
      .withColumn("title",
        coalesce(last(when(col("kind") === "heading", col("content")), true).over(w),
          lit("")))
      .filter(col("kind") =!= "heading")
      .groupBy(col("doc"), col("section_idx"), col("title"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("block_idx"), col("content")))),
          b => b.getField("content")), "\n").as("content"),
        count(lit(1)).as("n_blocks"))
  }
}
