package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's chunking operators (SURVEY.md §2.3) — each maps one
  * document row to N chunk rows. In Spark these are generators
  * (`posexplode` over an array-building expression) so they stay inside
  * whole-stage codegen and scale row-parallel; only the order-sensitive
  * folds (C4/C5) drop to the typed Dataset API (`flatMapGroups`).
  *
  * Reference constants (BASELINE.md): chunk_size=1000, overlap=200,
  * min_chunk=100 chars (`document_processing_service.py:542-545`);
  * min paragraph length 50 (PDF) / 20 (email) (`:295,519`).
  */
object Chunking {

  /** C8 — derived word count (`document_processing_service.py:56-58`:
    * len(content.split())). */
  def wordCount(content: Column): Column =
    size(split(trim(content), "\\s+"))

  /** C2 — paragraph splitter (`document_processing_service.py:290-302`):
    * split on blank lines, trim, drop paragraphs ≤ `minChars`, emit
    * chunk_id `{doc}_p{page}_para{idx}` (page is always 0 here: the
    * testdata documents are pre-extracted single-page text). */
  def paragraphChunks(docs: DataFrame, minChars: Int = 50,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), posexplode(split(col(textCol), "\n{2,}")).as(Seq("para_idx", "content")))
      .withColumn("content", trim(col("content")))
      .filter(length(col("content")) > minChars)
      .select(
        concat_ws("_", col(idCol), lit("p0"), concat(lit("para"), col("para_idx"))).as("chunk_id"),
        col(idCol).as("document_id"),
        col("para_idx"),
        col("content"),
        lit("paragraph").as("chunk_type"),
        wordCount(col("content")).as("word_count"))

  /** C6 — sliding word windows (`document_processing_service.py:665-689`):
    * lower + tokenize, drop non-alphanumeric tokens and stopwords, then
    * windows of `windowSize` meaningful words with step
    * `windowSize - overlap`, chunk_id `{doc}_sliding_{i}`. Reference
    * defaults 1000/200; the synthetic docs are ~50 words so callers pick
    * smaller parameters. Array-based ROWS-frame analogue — no shuffle at
    * all (per-row generator). */
  def slidingWindowChunks(docs: DataFrame, windowSize: Int = 1000, overlap: Int = 200,
                          idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(windowSize > 0 && overlap >= 0 && overlap < windowSize,
      s"need 0 <= overlap < windowSize, got windowSize=$windowSize overlap=$overlap" +
        " (overlap >= windowSize gives a non-advancing window)")
    val step = windowSize - overlap
    // ComputeOnce: the min-length filter otherwise gets pushed below this
    // projection and the tokenize+stopword HOF subtree is re-evaluated at
    // every reference (three sites in the optimized plan — measured)
    val words = graft.functions.ComputeOnce.once(
      filter(
        split(lower(trim(col(textCol))), "\\s+"),
        w => w.rlike("^[a-z0-9]+$") && !array_contains(stopwordsLit, w)))
    docs
      .withColumn("words", words)
      .withColumn("n", size(col("words")))
      .filter(col("n") >= windowSize)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), col("n") - windowSize, lit(step)),
          i => array_join(slice(col("words"), i + 1, lit(windowSize)), " "))).as(Seq("win_idx", "content")))
      .select(
        concat_ws("_", col(idCol), lit("sliding"), col("win_idx")).as("chunk_id"),
        col(idCol).as("document_id"),
        col("win_idx"),
        col("content"),
        lit("sliding_window").as("chunk_type"),
        wordCount(col("content")).as("word_count"))
  }

  /** The reference removes NLTK english stopwords before windowing
    * (`document_processing_service.py:668-669`). Deterministic subset used
    * here (NLTK's list, public). */
  val stopwords: Seq[String] = Seq(
    "i", "me", "my", "we", "our", "you", "your", "he", "him", "his", "she",
    "her", "it", "its", "they", "them", "their", "what", "which", "who",
    "this", "that", "these", "those", "am", "is", "are", "was", "were",
    "be", "been", "being", "have", "has", "had", "do", "does", "did",
    "a", "an", "the", "and", "but", "if", "or", "because", "as", "until",
    "while", "of", "at", "by", "for", "with", "about", "against",
    "between", "into", "through", "during", "before", "after", "above",
    "below", "to", "from", "up", "down", "in", "out", "on", "off", "over",
    "under", "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "can", "will", "just", "should",
    "now")
  private def stopwordsLit: Column = array(stopwords.map(lit): _*)

  /** C3 — table → text chunk (`document_processing_service.py:351-367`):
    * header line + " | "-joined rows, one line per non-empty row.
    * `headers ARRAY<STRING>`, `rows ARRAY<ARRAY<STRING>>`. */
  def tableToText(headers: Column, rows: Column): Column = {
    val rowLines = transform(
      filter(rows, r => exists(r, c => length(trim(c)) > 0)),
      r => array_join(r, " | "))
    array_join(concat(array(array_join(headers, " | ")), rowLines), "\n")
  }

  /** C9 — section-title prefixing for embedding text
    * (`vectorizer.py:51-57`): prepend "{title}\n\n" unless the content
    * already contains the title. */
  def withTitlePrefix(title: Column, content: Column): Column =
    when(title.isNotNull && length(title) > 0 && !content.contains(title),
      concat_ws("\n\n", title, content))
      .otherwise(content)

  /** C4 — sentence-bounded re-split of large chunks
    * (`document_processing_service.py:589-627`): split into sentences,
    * greedily pack consecutive sentences into sub-chunks of ≤ `maxChars`;
    * a single over-long sentence becomes its own sub-chunk. Ordered fold →
    * implemented as a pure Scala function (unit-testable) + a typed
    * Dataset wrapper in [[ChunkFolds]]. */
  def packSentences(text: String, maxChars: Int = 1000): Seq[String] = {
    val sentences = text.split("(?<=[.!?])\\s+").toSeq.filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    for (s <- sentences) {
      if (cur.isEmpty) cur.append(s)
      else if (cur.length + 1 + s.length <= maxChars) { cur.append(' '); cur.append(s) }
      else { out += cur.toString; cur.clear(); cur.append(s) }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** Content-defined chunking: split the token stream where the rolling
    * hash of the LAST `window` tokens ≡ 0 (mod `modulus`). Because the
    * boundary test sees only a local window, an edit perturbs boundaries
    * only within `window` tokens of the change — everything later
    * re-chunks identically (the dedup-stability property fixed-size
    * chunking lacks; a whole-prefix hash would lack it too). Avg chunk
    * length ≈ `modulus` tokens.
    *
    * Array formulation (per-row generator, shuffle-free) with O(n·w)
    * windowed folds — right for paragraph/document-sized token counts. A
    * 100 TB corpus of BOOK-length texts would move the same hash to a
    * byte-stream `mapPartitions` kernel; the boundary rule is identical. */
  def cdcChunks(docs: DataFrame, modulus: Int = 16, window: Int = 4,
                base: Long = 1000003L, p: Long = 1000000007L,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    // Windowed hash via (window-1) zip_with passes over zero-padded
    // shifted copies: wh_i = fold over hs[i-w+1..i] with seed 0. The
    // leading zero-pad reproduces the partial windows at the start
    // (0·B + x = x), so semantics match the per-position fold exactly —
    // but each pass is O(n) with no nested aggregate-over-slice, which
    // doesn't codegen and costs minutes interpreted at corpus scale.
    def shifted(hs: Column, n: Column, k: Int): Column =
      if (k == 0) hs
      else slice(concat(array_repeat(lit(0L), lit(k)), hs), lit(1), n)
    val df0 = docs
      .withColumn("_toks", toks)
      .withColumn("_hs", transform(col("_toks"), t => pmod(Dedup.md5Hash60(t), lit(p))))
      .withColumn("_n", size(col("_toks")))
    val wh = (window - 2 to 0 by -1).foldLeft(
        shifted(col("_hs"), col("_n"), window - 1)) { (acc, k) =>
      zip_with(acc, shifted(col("_hs"), col("_n"), k),
        (x, y) => pmod(x * base + y, lit(p)))
    }
    // Boundary positions via the (element, index) transform overload —
    // _wh stays a transform INPUT (evaluated once per row). An
    // index-based `filter(sequence(1,n), i => element_at(_wh, i) ...)`
    // lets Catalyst inline the once-used _wh alias into the lambda BODY,
    // re-evaluating the whole windowed-hash array per element: O(n²) and
    // ~20× slower measured.
    val df = df0
      .withColumn("_wh", wh)
      .withColumn("_bounds", filter(
        transform(col("_wh"), (h, i) =>
          when(pmod(h, lit(modulus.toLong)) === 0, i + 1)),
        x => x.isNotNull))
      .withColumn("_starts", concat(array(lit(0)), col("_bounds")))
      .withColumn("_ends", concat(col("_bounds"), array(size(col("_toks")))))
    df.select(col(idCol),
        posexplode(filter(zip_with(col("_starts"), col("_ends"),
            (s, e) => when(e > s, struct(s.as("s"), e.as("e")))),
          x => x.isNotNull)).as(Seq("cdc_idx", "seg")),
        col("_toks"))
      .select(
        concat_ws("_", col(idCol), lit("cdc"), col("cdc_idx")).as("chunk_id"),
        col(idCol).as("document_id"), col("cdc_idx"),
        array_join(slice(col("_toks"), col("seg.s") + 1, col("seg.e") - col("seg.s")), " ")
          .as("content"),
        (col("seg.e") - col("seg.s")).cast("int").as("n_tokens"))
  }

  /** C5 — combine small consecutive chunks
    * (`document_processing_service.py:629-663`): adjacent chunks shorter
    * than `minChars` are merged (joined with "\n\n") until the combined
    * text reaches `minChars`; a big chunk flushes the pending merge. */
  def combineSmall(chunks: Seq[String], minChars: Int = 100): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val pending = new StringBuilder
    for (c <- chunks) {
      if (c.length >= minChars) {
        if (pending.nonEmpty) { out += pending.toString; pending.clear() }
        out += c
      } else {
        if (pending.nonEmpty) pending.append("\n\n")
        pending.append(c)
        if (pending.length >= minChars) { out += pending.toString; pending.clear() }
      }
    }
    if (pending.nonEmpty) out += pending.toString
    out.toSeq
  }
}
