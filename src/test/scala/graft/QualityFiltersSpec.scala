package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, TextAnalysis}

/** The two published quality-filter families added round 16: Gopher
  * rules (Rae et al. 2021 appendix A) and C4 line/page cleaning
  * (Raffel et al. 2020 §2.2). Hand-computed verdicts per rule. */
class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def gopher(texts: String*): Map[Long, org.apache.spark.sql.Row] =
    TextAnalysis.gopherQuality(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("gopher: each rule trips independently; a clean page passes") {
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ")
    val clean = fifty + " and that story had the happy end we hoped it would have."
    val someBullets = clean + "\n- one\n- two\n- three\n- four\n- five\n- six"
    // a page that is ESSENTIALLY a bullet list: 30 of 31 lines bulleted
    val allBullets = clean +
      (1 to 30).map(i => s"\n- the quick brown fox item$i").mkString
    val symbols = clean + " " + ("#" * 7).mkString(" ")
    val fewStops = fifty + " plain prose sentence lacking markers entirely."
    val out = gopher(clean, someBullets, allBullets, symbols, fewStops,
      "tiny page with that and the stops.")
    assert(out(0).getAs[Boolean]("gopher_pass"), "clean page must pass")
    // Gopher's bullet rule (Rae et al. 2021 app. A) removes pages with
    // MORE than 90% bulleted lines — a list-bearing page survives:
    // six bullet lines over seven lines is 857142 micro, under the cap
    assert(out(1).getAs[Long]("bullet_frac_micro") === 857142L)
    assert(out(1).getAs[Boolean]("gopher_pass"), "a 6/7-bullet page must pass")
    // 30 of 31 lines: 967741 micro > the 90% cap
    assert(out(2).getAs[Long]("bullet_frac_micro") === 967741L)
    assert(!out(2).getAs[Boolean]("gopher_pass"))
    // seven '#' over ~63 words: >10% symbol ratio
    assert(out(3).getAs[Long]("symbol_ratio_micro") > 100000L)
    assert(!out(3).getAs[Boolean]("gopher_pass"))
    // only 'the'-free filler: n_stop < 2
    assert(out(4).getAs[Int]("n_stop") < 2)
    assert(!out(4).getAs[Boolean]("gopher_pass"))
    // 7 words: under the 50-word floor
    assert(out(5).getAs[Int]("n_words") < 50 && !out(5).getAs[Boolean]("gopher_pass"))
  }

  test("gopher: ellipsis and alpha-word rules; micro-units are exact integer floors") {
    val out = gopher(
      "one line.\nto be continued...\nalso unfinished...",
      "abc 123 456 789 000 111")
    val e = out(0)
    // 2 of 3 lines end in '...': 666666 micro > 300000 cap
    assert(e.getAs[Long]("ellipsis_frac_micro") === 666666L)
    // 1 of 6 words has a letter: 166666 micro < 800000 floor
    val a = out(1)
    assert(a.getAs[Long]("alpha_frac_micro") === 166666L)
    assert(!a.getAs[Boolean]("gopher_pass"))
  }

  test("gopher repetition: dup counts are occurrences-beyond-first, by unit and by chars") {
    val pages = Seq(
      // 4 distinct lines, 2 distinct paras: repetition-free
      (0L, "alpha\nbeta\n\ngamma\ndelta"),
      // the para repeats: lines [alpha(5), beta(4), "", alpha, beta] →
      // dup lines 2/5 = 400000; dup line chars 9/18 = 500000;
      // paras [p,p] → dup 1/2 = 500000, dup chars 10/20 = 500000
      (1L, "alpha\nbeta\n\nalpha\nbeta"),
      // one line repeats inside one para: 1/3 lines, 3/13 chars; paras unique
      (2L, "abc\nlonger line\nabc"))
    val out = TextAnalysis.gopherRepetition(pages.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("repetition_pass"))
    assert(out(0L).getAs[Long]("dup_line_frac_micro") === 0L)
    val dup = out(1L)
    assert(dup.getAs[Long]("dup_line_frac_micro") === 400000L)
    assert(dup.getAs[Long]("dup_line_char_frac_micro") === 500000L)
    assert(dup.getAs[Long]("dup_para_frac_micro") === 500000L)
    assert(dup.getAs[Long]("dup_para_char_frac_micro") === 500000L)
    assert(!dup.getAs[Boolean]("repetition_pass"))
    val part = out(2L)
    assert(part.getAs[Long]("dup_line_frac_micro") === 333333L)
    assert(part.getAs[Long]("dup_line_char_frac_micro") === 176470L) // 3/17
    assert(part.getAs[Long]("dup_para_frac_micro") === 0L)
    // 333333 > 300000: the line-fraction rule alone fails the page
    assert(!part.getAs[Boolean]("repetition_pass"))
  }

  test("c4: line rules (terminal punct, word floor, javascript) and page rules") {
    val pages = Seq(
      (0L, "this first line carries five words.\nshort.\nno terminal punctuation here at all\nthis second keeper also has enough words!\nand a third keeper rounds out the page?"),
      (1L, "this first line carries five words.\nenable javascript to view this page.\nonly three keepers survive on this one.\nbecause the scripted line is gone now."),
      (2L, "a fine page with lorem ipsum inside it.\nsecond proper sentence keeps going strong.\nthird proper sentence keeps going strong."),
      (3L, "a curly json { snippet poisons the page.\nsecond proper sentence keeps going strong.\nthird proper sentence keeps going strong."),
      // ONE kept line holding THREE sentences: the §2.2 page rule
      // counts sentences, so this page survives
      (4L, "one keeper line holds this. also that one does. plus a third sentence ends!\nno terminal punctuation on the second line"))
    val out = Cleaning.c4Clean(pages.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val ok = out(0L)
    assert(ok.getAs[Boolean]("keep_doc"))
    assert(ok.getAs[Int]("n_kept") === 3)
    assert(ok.getAs[Int]("n_sentences") === 3)
    assert(ok.getAs[String]("clean_text") ===
      "this first line carries five words.\nthis second keeper also has enough words!\nand a third keeper rounds out the page?")
    // the javascript line drops; the other three survive
    assert(out(1L).getAs[Int]("n_kept") === 3 && out(1L).getAs[Boolean]("keep_doc"))
    assert(!out(1L).getAs[String]("clean_text").contains("javascript"))
    // lorem ipsum and '{' kill the PAGE even though lines individually pass
    assert(!out(2L).getAs[Boolean]("keep_doc") && out(2L).getAs[String]("clean_text") === "")
    assert(!out(3L).getAs[Boolean]("keep_doc") && out(3L).getAs[String]("clean_text") === "")
    // one kept line, three sentences: the page-level rule counts
    // SENTENCES of the retained text, so n_kept=1 still keeps the page
    val multi = out(4L)
    assert(multi.getAs[Int]("n_kept") === 1)
    assert(multi.getAs[Int]("n_sentences") === 3)
    assert(multi.getAs[Boolean]("keep_doc"))
  }

  test("CCNet perplexity buckets: exact rank thresholds, frozen-artifact " +
      "assignment, token-less docs take the tail") {
    import spark.implicits._
    // 9 docs, one language, engineered so surprisal strictly increases
    // with rarity: doc i repeats a common word then adds i rare ones
    val docs = (1L to 9L).map { i =>
      val rare = (1L to i).map(j => s"rare${i}x$j").mkString(" ")
      (i, "en", s"common common common $rare")
    }.toDF("doc_id", "lang", "text")
    val lm = TextAnalysis.trainUnigramLm(docs)
    val th = TextAnalysis.perplexityThresholds(docs, lm)
    val bounds = th.collect().map(r => r.getAs[Int]("boundary_idx") ->
      r.getAs[Double]("boundary")).toMap
    assert(bounds.keySet === Set(1, 2), "k-1 boundaries per language")
    // boundary r sits at exact rank ceil(r*9/3) = 3 and 6
    val sp = TextAnalysis.unigramSurprisalWith(docs, lm)
      .orderBy("avg_surprisal").collect().map(_.getAs[Double]("avg_surprisal"))
    assert(bounds(1) === sp(2) && bounds(2) === sp(5))
    val out = TextAnalysis.assignPerplexityBuckets(docs, lm, th).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert((1L to 9L).map(out).groupBy(identity).view.mapValues(_.size).toMap ===
      Map("head" -> 3, "middle" -> 3, "tail" -> 3))
    // the artifact is FROZEN: scoring a new batch reuses it per-row
    val batch = Seq((100L, "en", "common common common"),
      (101L, "en", ""), (102L, "xx", "common")).toDF("doc_id", "lang", "text")
    val scored = TextAnalysis.assignPerplexityBuckets(batch, lm, th).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(scored(100L) === "head", "all-common text scores below boundary 1")
    assert(scored(101L) === "tail", "token-less lands in the tail")
    assert(scored(102L) === "tail", "unknown language lands in the tail")
  }
}
