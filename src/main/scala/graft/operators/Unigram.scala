package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (the SentencePiece model family),
  * beyond-reference training-pipeline tier alongside [[Bpe]].
  *
  * SentencePiece seeds a piece vocabulary from frequent substrings,
  * then EM-iterates: E-step = per-word Viterbi-best segmentation under
  * per-piece scores, M-step = re-estimate scores from the expected
  * counts. This implements the seed + the Viterbi DP with an INTEGER
  * objective — lexicographically (fewest pieces, then largest summed
  * piece frequency mass), encoded as one long `n·BIG − mass` — because
  * an engine-replayable oracle cannot compare float log-prob sums
  * (ulp-level `ln` differences across engines flip ties; see the
  * verify-skill gotchas). Swapping the per-piece cost `BIG − cnt` for
  * `round(−1e6·log p)` turns this into the textbook E-step unchanged.
  *
  * Scale design: everything is vocab-compressed like [[Bpe]] — the
  * corpus collapses once to `(word, freq)`, substring seeding and the
  * DP run over the vocabulary, and the kept piece inventory (all
  * single characters + top-K multi-char substrings: SentencePiece's
  * seed pruning) is driver-collected model state, shipped as a literal
  * map. The DP itself is one codegen'd `aggregate` walk per word — no
  * UDF, no join, no shuffle beyond the vocab aggregation.
  */
object Unigram {

  /** Substring seed counts over a `(word, freq)` vocabulary: every
    * substring of length 1..`maxPieceLen`, weighted by word frequency
    * and counted per occurrence position. One generator + one
    * aggregation, both vocab-bounded. */
  def seedPieces(vocab: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    val subs = flatten(expr(
      s"""transform(sequence(1, length(word)), s ->
         |  transform(sequence(1, least($maxPieceLen, length(word) - s + 1)), l ->
         |    substring(word, s, l)))""".stripMargin))
    vocab
      .select(col("freq"), explode(subs).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
  }

  /** SentencePiece's seed pruning, determinized: keep EVERY length-1
    * piece (so any in-alphabet word stays segmentable) plus the top
    * `keepTop` multi-character pieces by (cnt desc, piece asc). */
  def prunedSeed(seed: DataFrame, keepTop: Int = 40): DataFrame = {
    val ones = seed.filter(length(col("piece")) === 1)
    // top-K via orderBy+limit (TakeOrderedAndProject): a global
    // row_number window would funnel the whole multi-char substring
    // space — vocab · wordLen · maxPieceLen rows at corpus scale —
    // through one reducer; the bounded take is distributed and has the
    // identical deterministic result
    val multi = seed.filter(length(col("piece")) > 1)
      .orderBy(desc("cnt"), asc("piece")).limit(keepTop)
    ones.unionByName(multi)
  }

  /** The fitted seed model: piece → count map plus the cost-encoding
    * base `BIG = maxWordLen · maxCnt + 1`, chosen so that within one
    * piece-count tier no achievable mass (≤ maxWordLen · maxCnt) can
    * outweigh a tier step — minimizing `n·BIG − mass` is exactly the
    * lexicographic (min pieces, max mass) objective. */
  final case class SeedModel(pieces: Map[String, Long], maxPieceLen: Int, big: Long)

  /** Collect the pruned seed + the DP constants driver-side (the model
    * artifact — piece inventory sizes are pruning-bounded, not
    * corpus-bounded). */
  def fitSeed(vocab: DataFrame, maxPieceLen: Int = 4, keepTop: Int = 40): SeedModel = {
    val kept = prunedSeed(seedPieces(vocab, maxPieceLen), keepTop)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(kept.nonEmpty, "empty corpus: no seed pieces")
    val maxWordLen = vocab.agg(max(length(col("word")))).head().getInt(0).toLong
    SeedModel(kept, maxPieceLen, maxWordLen * kept.values.max + 1)
  }

  private def probeLen(model: SeedModel): Int =
    math.min(model.maxPieceLen, model.pieces.keys.map(_.length).max)

  /** The full Viterbi cost table of `word` under the seed model, as a
    * codegen'd expression: `aggregate` grows the per-prefix cost table
    * one character at a time; each step takes the min over pieces
    * ending at the new position (`least` skips the null candidates
    * where the substring is not in the inventory — length-1 pieces
    * guarantee at least one survivor for in-alphabet words). Entry
    * `i+1` is the best cost of the first `i` characters. */
  def viterbiTable(word: Column, model: SeedModel): Column = {
    val cntMap = typedlit(model.pieces)
    val table = aggregate(
      sequence(lit(1), length(word)),
      array(lit(0L)),
      (acc, j) => {
        val candidates = (1 to probeLen(model)).map { l =>
          val piece = word.substr(j - lit(l) + 1, lit(l))
          val cnt = element_at(cntMap, piece)
          when(j >= l && cnt.isNotNull,
            element_at(acc, j - lit(l) + 1) + lit(model.big) - cnt)
        }
        array_append(acc, candidates.reduce(least(_, _)))
      },
      acc => acc)
    // empty-word guard: sequence(1, 0) yields [1, 0] (step -1), padding
    // the table to 3 null-costed entries; the empty word's true table is
    // the single zero-cost entry (and it then segments to []).
    when(length(word) === 0, array(lit(0L))).otherwise(table)
  }

  /** Full-word Viterbi cost `n_pieces · BIG − piece_mass` — the last
    * table entry. */
  def viterbiCost(word: Column, model: SeedModel): Column =
    element_at(viterbiTable(word, model), -1)

  /** The CANONICAL optimal segmentation, reconstructed from the cost
    * table by the deterministic longest-piece-first backtrack: from the
    * word's end, take the LONGEST piece whose cost edge is tight
    * (`cost(pos−l) + BIG − cnt = cost(pos)`) and step back. Every tie
    * among optimal paths resolves the same way in any engine — integer
    * equality, no float compare — which is what lets the M-step's
    * expected counts be oracle-checked. Emitted in word order. */
  def viterbiPieces(word: Column, model: SeedModel): Column =
    backtrack(word, viterbiTable(word, model), model)

  /** Backtrack against an already-bound cost `table` column. Callers on
    * a hot path bind the table with `withColumn` first — the lambda
    * references the table 2·probeLen times per step, and an inline
    * table expression would be copied (and recomputed) at every one of
    * those references. */
  def backtrack(word: Column, table: Column, model: SeedModel): Column = {
    val cntMap = typedlit(model.pieces)
    val raw = backtrackWalk(word, table, cntMap, model)
    // OUT-OF-ALPHABET guard: a null cost table (word has a character the
    // model never saw — cross-corpus model reuse) makes every tight-edge
    // test false, the walk stalls, and the unguarded result would be
    // len(word) empty strings. Surface null instead, mirroring
    // [[viterbiStats]]' null stats (and explode() then drops the word
    // from [[expectedPieceCounts]] rather than polluting it).
    when(element_at(table, -1).isNull, lit(null).cast("array<string>"))
      .otherwise(raw)
  }

  private def backtrackWalk(word: Column, table: Column, cntMap: Column,
                            model: SeedModel): Column = {
    val walked = aggregate(
      sequence(lit(1), length(word)),
      struct(length(word).as("pos"), array().cast("array<string>").as("rev")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val matchLen = (1 to probeLen(model)).foldLeft(lit(0)) { (shorter, l) =>
          val piece = word.substr(pos - lit(l) + 1, lit(l))
          val cnt = element_at(cntMap, piece)
          when(pos >= l && cnt.isNotNull &&
            element_at(table, pos - lit(l) + 1) + lit(model.big) - cnt ===
              element_at(table, pos + 1), lit(l))
            .otherwise(shorter)
        }
        when(pos <= 0, acc).otherwise(
          struct((pos - matchLen).as("pos"),
            array_append(acc.getField("rev"),
              word.substr(pos - matchLen + 1, matchLen)).as("rev")))
      },
      acc => reverse(acc.getField("rev")))
    walked
  }

  /** M-step statistics of the EM iteration: expected piece counts over
    * the corpus — each vocab word's canonical optimal segmentation,
    * weighted by word frequency — `(piece, expected_cnt)`. Re-deriving
    * piece scores from these counts and re-running [[viterbiStats]] IS
    * the next EM round; like everything here it is vocab-compressed, so
    * an iteration costs one vocab-bounded job regardless of corpus
    * size. */
  def expectedPieceCounts(vocab: DataFrame, model: SeedModel): DataFrame =
    vocab
      .withColumn("__tab", viterbiTable(col("word"), model))
      // the backtrack is aliased BEFORE the explode, in a separate
      // projection: explode(backtrack(...)) in one select lets the
      // optimizer collapse `__tab` inline into the walk's aggregate
      // lambda, and nesting one HOF aggregate inside another's lambda
      // collides their lambda variables (observed: the walk then reads
      // a corrupt table and emits empty-string pieces). The Generate
      // boundary below keeps the two aggregates in separate projections.
      .withColumn("__pieces", backtrack(col("word"), col("__tab"), model))
      .select(col("freq"), explode(col("__pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("expected_cnt"))

  /** Per-word optimal segmentation statistics over a `(word, freq)`
    * vocabulary: `(word, freq, n_pieces, piece_mass)` where `n_pieces`
    * is the MINIMUM piece count under the inventory and `piece_mass`
    * the largest frequency mass among those minimal segmentations —
    * decoded from the single DP cost, so tie-broken paths (same n, same
    * mass) need no canonical order. A word containing a character
    * absent from the model's alphabet yields a null cost and is
    * surfaced with null stats rather than dropped. */
  def viterbiStats(vocab: DataFrame, model: SeedModel): DataFrame = {
    val cost = viterbiCost(col("word"), model)
    // exact long floor-division (a float divide would lose ulps once
    // costs pass 2^53 at real corpus scale); mass ≥ 1 keeps the cost
    // strictly inside its tier so `div` never lands on a boundary
    val n = expr(s"__cost div ${model.big}") + 1L
    vocab
      .withColumn("__cost", cost)
      .select(col("word"), col("freq"), n.as("n_pieces"),
        (n * lit(model.big) - col("__cost")).as("piece_mass"))
  }

  /** The whole operator over a corpus: collapse to the word vocabulary,
    * fit the seed model, run the DP. */
  def segmentCorpus(docs: DataFrame, maxPieceLen: Int = 4, keepTop: Int = 40,
                    textCol: String = "text"): DataFrame = {
    val vocab = Bpe.wordVocab(docs, textCol).select("word", "freq").localCheckpoint()
    viterbiStats(vocab, fitSeed(vocab, maxPieceLen, keepTop))
  }

  /** One full EM round: the M-step's expected counts BECOME the next
    * model's piece scores (unused pieces drop — SentencePiece's
    * pruning), with `BIG` re-derived for the new count range. Every
    * word stays segmentable: its previous canonical path's pieces all
    * earned counts, so at least that segmentation survives into the
    * next round. One vocab-bounded job per round regardless of corpus
    * size. */
  def emRound(vocab: DataFrame, model: SeedModel): SeedModel = {
    val counts = expectedPieceCounts(vocab, model).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "EM round over an empty segmentation")
    val maxWordLen = vocab.agg(max(length(col("word")))).head().getInt(0).toLong
    SeedModel(counts, model.maxPieceLen, maxWordLen * counts.values.max + 1)
  }

  /** One EM iteration's corpus-level summary: the model's piece
    * inventory size and the frequency-weighted totals of the optimal
    * segmentations — `total_pieces` is the integer objective's primary
    * tier, comparable ACROSS rounds (piece counts don't depend on the
    * per-round `BIG` rescale the way raw costs do), which is what the
    * loop's stopping rule reads. */
  final case class EmIter(iter: Int, model_pieces: Int,
                          total_pieces: Long, total_mass: Long)

  /** Corpus totals under a model: `(Σ freq·n_pieces, Σ freq·mass)`.
    * An empty/all-filtered vocabulary sums to null — surface that as a
    * descriptive error instead of letting `getLong` throw an opaque
    * NullPointerException from inside the EM loop. */
  private def corpusTotals(vocab: DataFrame, model: SeedModel): (Long, Long) = {
    val r = viterbiStats(vocab, model)
      .agg(sum(col("freq") * col("n_pieces")).as("tp"),
        sum(col("freq") * col("piece_mass")).as("tm")).head()
    require(!r.isNullAt(0),
      "unigram corpusTotals: empty vocabulary — the corpus produced no " +
        "words (all rows filtered or empty text); nothing to fit")
    (r.getLong(0), r.getLong(1))
  }

  /** Persist a fitted seed model (piece scores + DP constants) — the
    * unigram analogue of [[Bpe.saveModel]]'s train-once artifact.
    * Parquet, one row per piece with the two scalar constants repeated
    * (self-describing single table; no sidecar file to lose). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: SeedModel,
                dir: String): Unit = {
    import spark.implicits._
    model.pieces.toSeq.sortBy(_._1)
      .map { case (p, c) => (p, c, model.maxPieceLen, model.big) }
      .toDF("piece", "cnt", "max_piece_len", "big")
      .write.mode("overwrite").parquet(dir)
  }

  /** Load a persisted seed model. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, dir: String): SeedModel = {
    val rows = spark.read.parquet(dir)
      .select("piece", "cnt", "max_piece_len", "big").collect()
    require(rows.nonEmpty, s"empty unigram model at $dir")
    SeedModel(rows.map(r => r.getString(0) -> r.getLong(1)).toMap,
      rows.head.getInt(2), rows.head.getLong(3))
  }

  /** EM to CONVERGENCE — the loop SentencePiece runs, over the integer
    * objective: iterate [[emRound]] (M-step refit, unused pieces
    * pruned) until the weighted total piece count stops improving by
    * more than `minDelta`, or `maxIters` rounds. Returns the kept
    * model plus one [[EmIter]] row per round RUN — including the round
    * that triggered the stop, so the trace itself witnesses
    * convergence.
    *
    * The integer surrogate is NOT guaranteed monotone under the count
    * refit, so the returned model is the LATEST non-regressing round:
    * a stopping round whose total merely failed to improve enough
    * (equal, or within `minDelta`) is kept — it carries the pruning —
    * but a round that made the corpus total strictly WORSE is
    * discarded in favor of its predecessor. Deterministic end to end
    * (integer compares only), hence DuckDB-replayable; each round
    * costs two vocab-bounded jobs regardless of corpus size. */
  def emLoop(vocab: DataFrame, seed: SeedModel, maxIters: Int,
             minDelta: Long = 0L): (SeedModel, Seq[EmIter]) = {
    require(maxIters >= 1, s"need maxIters >= 1, got $maxIters")
    require(minDelta >= 0L, s"need minDelta >= 0, got $minDelta")
    var model = seed
    var (tp, tm) = corpusTotals(vocab, model)
    val iters = Seq.newBuilder[EmIter]
    iters += EmIter(1, model.pieces.size, tp, tm)
    var i = 1
    var stopped = false
    while (i < maxIters && !stopped) {
      val next = emRound(vocab, model)
      val (tp2, tm2) = corpusTotals(vocab, next)
      i += 1
      iters += EmIter(i, next.pieces.size, tp2, tm2)
      if (tp2 >= tp - minDelta) stopped = true // no (sufficient) improvement
      if (tp2 <= tp) { model = next; tp = tp2; tm = tm2 } // never keep a regression
    }
    (model, iters.result())
  }
}
