package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / bucketing for the training-data
  * pipeline tier: every operator here is a pure function of the data (md5
  * of the key, never an RNG), so any engine — and any re-run over 100 TB —
  * selects byte-identical subsets. Spark's `sample()`/`randomSplit()` are
  * seed-stable only for a fixed partitioning, which no production table
  * keeps; hash-based selection is the reproducible form.
  */
object Sampling {

  /** Uniform hash of a key into [0, 65536): the first 4 hex chars of md5,
    * parsed base-16. Cross-engine: DuckDB `('0x' || substr(md5(k),1,4))::BIGINT`. */
  def md5Bucket64k(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

  /** Deterministic train/test split by hash threshold — scan-only, zero
    * shuffle, stable under any partitioning, re-run, or engine: a row is
    * `test` iff its key's hash bucket falls below `testFrac` of the hash
    * space. The standard held-out split for a 100 TB corpus (a random
    * split would need a persisted assignment to be reproducible). */
  def trainTestSplit(df: DataFrame, keyCol: String,
                     testFrac: Double = 0.1): DataFrame = {
    val cut = math.round(testFrac * 65536).toInt
    df.withColumn("bucket", md5Bucket64k(col(keyCol)))
      .withColumn("split", when(col("bucket") < cut, "test").otherwise("train"))
  }

  /** Stratified sample with EXACT per-stratum counts: within each stratum
    * rank rows by key hash (deterministic shuffle order) and keep the
    * first ceil(frac·|stratum|). One window shuffle partitioned by the
    * stratum — fine while strata are numerous/balanced; for a handful of
    * giant strata prefer [[trainTestSplit]]'s thresholding per stratum
    * (scan-only, approximate counts) over ranking a hot partition. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       frac: Double = 0.1): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5Bucket64k(col(keyCol)), col(keyCol))
    val n = Window.partitionBy(col(stratumCol))
    df.withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(n))
      .filter(col("_rk") <= ceil(col("_n") * frac))
      .drop("_rk", "_n")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis): each
    * row draws a deterministic uniform u from its key's md5 and ranks by
    * the exponential key ln(u)/w — the top `n` rows are EXACTLY a
    * w-weighted sample, and the derivation is a pure function of the key
    * so any engine or re-run selects the same rows. The top-n is
    * `orderBy().limit()` — Spark plans `TakeOrderedAndProject`, a
    * per-partition heap + driver merge of n rows, never a global sort of
    * the corpus.
    *
    * The RANKING key is the unrounded double: any absolute rounding
    * collapses the keys once weights grow (w ≈ 1e9 squeezes every key
    * into [-4e-8, 0], where 9-decimal rounding would leave ~40 distinct
    * values and the id tiebreak — not the weights — would pick the
    * sample). The EMITTED `es_key` is rounded to 9 decimals only so the
    * output column hash-compares across engines; selection never reads
    * it. ln is the one libm step — an engine pair disagreeing by an ULP
    * could in principle flip a pair of keys within ~1e-16 relative of
    * each other at the cutoff, which no rounding scheme fixes without
    * breaking the weighting. */
  def weightedSample(df: DataFrame, n: Int, weightCol: String,
                     keyCol: String): DataFrame = {
    // u = (h+1)/2^60 ∈ (0, 1]; h is the 60-bit md5 integer of the key's
    // STRING form (a bare numeric key would md5 its binary encoding —
    // not what any other engine computes). long→double rounding is IEEE
    // round-to-nearest in both Spark and DuckDB.
    val u = (Dedup.md5Hash60(col(keyCol).cast("string")) + 1).cast("double") /
      lit(1152921504606846976.0)
    df.filter(col(weightCol) > 0)
      .withColumn("_es_raw", log(u) / col(weightCol).cast("double"))
      .orderBy(col("_es_raw").desc, col(keyCol))
      .limit(n)
      .withColumn("es_key", round(col("_es_raw"), 9))
      .drop("_es_raw")
  }

  /** Training-shard packing: assign documents to shards of roughly
    * `tokenBudget` tokens — the sharding step in front of an LLM
    * training run. Documents are spread over `nBuckets` independent
    * pack streams by key hash (parallelism knob: each bucket packs on
    * its own, so the window sort never sees more than corpus/nBuckets
    * rows), then sharded by the running token total within the bucket:
    * shard boundaries fall where the PRECEDING documents fill the
    * budget, so every document lands wholly in one shard and shards
    * overshoot by at most one document — the standard cumulative-sum
    * packing. Pure function of (key, token counts): any engine or
    * re-run shards identically. */
  def packShards(docs: DataFrame, tokenBudget: Int, nBuckets: Int = 32,
                 keyCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", size(split(trim(col(textCol)), "\\s+")))
      .withColumn("bucket", (md5Bucket64k(col(keyCol)) % nBuckets).cast("int"))
      .withColumn("shard_in_bucket",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / tokenBudget).cast("int"))
      .withColumn("shard_id",
        concat_ws("_", col("bucket"), col("shard_in_bucket")))
      .select(col(keyCol), col("bucket"), col("shard_id"), col("n_tokens"))
  }

  /** Winsorization: clip a numeric column to its [lo, hi] percentile
    * band — the standard outlier treatment before training-statistics
    * aggregation. Same shape as [[quantileBuckets]]: one distributed
    * percentile aggregate for the two cutoffs, broadcast to a
    * scan-parallel clamp; no sort, no shuffle of the data itself. */
  def winsorize(df: DataFrame, valCol: String,
                lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    val cuts = df.agg(
      round(expr(s"percentile($valCol, $lo)"), 4).as("_lo"),
      round(expr(s"percentile($valCol, $hi)"), 4).as("_hi"))
    df.crossJoin(broadcast(cuts))
      .withColumn(s"${valCol}_clipped",
        least(greatest(col(valCol), col("_lo")), col("_hi")))
      .withColumn("was_clipped", col(valCol) < col("_lo") || col(valCol) > col("_hi"))
      .drop("_lo", "_hi")
  }

  /** Quantile bucketing without a global sort: cutoffs from one
    * distributed `percentile` aggregate (both engines define the
    * continuous quantile identically), bucket membership from a
    * broadcast compare — scan-parallel at any scale, unlike `ntile()`
    * over an unpartitioned window, which Spark executes in a SINGLE
    * task. Buckets can be unequal when values tie across a cutoff;
    * that is inherent to value-based bucketing and identical in any
    * engine. */
  def quantileBuckets(df: DataFrame, valCol: String,
                      nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"quantileBuckets needs >= 2 buckets, got $nBuckets")
    val qs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    // ONE percentile buffer for all cutoffs (array form), then unpack
    val cuts = df
      .agg(expr(s"percentile($valCol, array(${qs.mkString(",")}))").as("_cs"))
      .select((0 until qs.size).map(i => round(col("_cs")(i), 4).as(s"c$i")): _*)
    val bucket = (0 until qs.size)
      .map(i => when(col(valCol) > col(s"c$i"), 1).otherwise(0))
      .reduce(_ + _) + 1
    df.crossJoin(broadcast(cuts)).withColumn("bucket", bucket)
      .drop((0 until qs.size).map(i => s"c$i"): _*)
  }

  /** Token-budget mixture PLANNER — the sizing step in front of
    * [[domainResample]]: given target mixture weights and a total token
    * budget, per domain report the tokens available, the tokens the
    * budget allocates, the implied sampling rate, and the epoch count —
    * `epochs > 1` means the mixture REPEATS that domain's data, the
    * data-constrained-scaling warning a curator acts on (shrink the
    * weight, or accept N-epoch repetition). The plan is TARGETS-driven:
    * a requested stratum with zero corpus presence still gets its row
    * (available 0, rate/epochs NULL, `repeats_data` true) — the exact
    * infeasibility a planner exists to surface; an inner join would
    * silently drop it. All integer arithmetic: weights go to literal
    * micro-units so the allocation `budget · w6 ÷ Σw6` is exact on any
    * engine; the one float column (`sample_rate`) is an unrounded
    * quotient of two BIGINTs — the same IEEE division everywhere. One
    * tokenize+aggregate pass over the corpus; targets ride as a
    * broadcast literal table. */
  def tokenBudgetPlan(docs: DataFrame, targets: Seq[(String, Double)],
                      budgetTokens: Long, stratumCol: String = "lang",
                      textCol: String = "text"): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "tokenBudgetPlan needs positive target weights")
    require(targets.map(_._1).distinct.size == targets.size,
      "tokenBudgetPlan targets must name each stratum once")
    import docs.sparkSession.implicits._
    val w6 = targets.map { case (s, w) => (s, math.round(w * 1e6)) }
    val sumW6 = w6.map(_._2).sum
    val shares = w6.toDF(stratumCol, "w6")
    val avail = docs
      .select(col(stratumCol),
        size(filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= ""))
          .cast("long").as("_tok"))
      .groupBy(col(stratumCol)).agg(sum(col("_tok")).as("available_tokens"))
    shares.join(avail, Seq(stratumCol), "left")
      .withColumn("available_tokens", coalesce(col("available_tokens"), lit(0L)))
      // DECIMAL(38,0) for the share product: budget × w6 overflows LONG
      // at trillion-token budgets (15e12 × 1e6 > 2^63), and non-ANSI
      // Long multiply would wrap SILENTLY into negative targets; 38
      // digits holds any real budget × weight, and all operands are
      // non-negative so `div` equals the exact floor
      .withColumn("target_tokens", expr(
        s"CAST((CAST($budgetTokens AS DECIMAL(38,0)) * w6) div $sumW6 AS BIGINT)"))
      .withColumn("sample_rate", when(col("available_tokens") > 0,
        col("target_tokens").cast("double") / col("available_tokens")))
      .withColumn("epochs", when(col("available_tokens") > 0,
        expr("(target_tokens + available_tokens - 1) div available_tokens")))
      .withColumn("repeats_data", col("target_tokens") > col("available_tokens"))
  }

  /** Materialize the [[tokenBudgetPlan]] into the actual training list —
    * the step that turns the sizing report into data: one output row per
    * (document, epoch) the mixture trains on. A stratum whose target
    * exceeds its available tokens REPEATS its data (the
    * data-constrained-scaling regime the plan's `epochs` column warns
    * about): every doc appears in epochs `0 .. target div available - 1`
    * in full, and the remainder epoch keeps the docs whose SALTED key
    * hash (`md5(id || ":epoch")`) falls under
    * `(target mod available) / available` of the hash space — salted so
    * the cut is independent of [[trainTestSplit]]/[[domainResample]]'s
    * unsalted buckets (an input pre-filtered by those would otherwise
    * see an empty or over-full remainder epoch), quantized to 1/65536.
    * Whenever ANY remainder tokens exist, the stratum's hash-MINIMAL
    * doc is additionally always in: a funded stratum is guaranteed to
    * emit, and the guarantee's overshoot is bounded by ONE document —
    * the irreducible row granularity (a flat one-bucket floor would
    * give neither bound: it admits ~N/65536 docs when it binds, and
    * still nothing when no doc hashes under it; exact-token packing
    * belongs to [[packShards]]). Absent strata have no docs to emit.
    * One per-stratum window ranks the hash-minimal doc; everything else
    * is scan-side after a broadcast join against the PLAN-side epoch
    * spine: the `(stratum, epoch_idx)` rows are exploded from the
    * handful-of-rows plan frame, never as a per-document array, so a
    * huge budget over a tiny stratum allocates one bounded array per
    * stratum instead of a million-element array per document.
    * `maxEpochs` (default 65536, the remainder cut's own quantization
    * granularity — orders of magnitude past any data-constrained-scaling
    * regime) is a fail-fast `raise_error` guard: a plan demanding more
    * full epochs is a sizing bug, and it bounds the broadcast spine at
    * strata·(maxEpochs+1) rows. Every engine/re-run emits the identical
    * list. */
  def epochMixture(docs: DataFrame, targets: Seq[(String, Double)],
                   budgetTokens: Long, stratumCol: String = "lang",
                   idCol: String = "doc_id", textCol: String = "text",
                   maxEpochs: Long = 65536L): DataFrame = {
    require(maxEpochs > 0, "epochMixture needs a positive maxEpochs")
    val plan = tokenBudgetPlan(docs, targets, budgetTokens, stratumCol, textCol)
      .filter(col("available_tokens") > 0)
      .select(col(stratumCol),
        expr("target_tokens div available_tokens").as("_full"),
        expr("((target_tokens % available_tokens) * 65536) div available_tokens")
          .as("_rem64k"),
        expr("target_tokens % available_tokens > 0").as("_has_rem"))
      // the guard lives INSIDE the _full value path — an unreferenced
      // check column would be pruned away unevaluated; raise_error's
      // NullType coerces to LONG in the CaseWhen
      .withColumn("_full",
        when(col("_full") <= maxEpochs, col("_full")).otherwise(raise_error(
          format_string("epochMixture: stratum %s needs %s full epochs " +
            s"(> maxEpochs=$maxEpochs) — the token budget vastly exceeds " +
            "this stratum's available tokens; fix the mixture weights or " +
            "raise maxEpochs explicitly", col(stratumCol), col("_full")))))
    // epoch spine exploded on the plan side: one row per funded epoch
    val spine = plan.select(col(stratumCol), col("_rem64k"), col("_has_rem"),
      col("_full"), explode(sequence(lit(0L), col("_full"))).as("epoch_idx"))
    val salted = md5Bucket64k(concat(col(idCol).cast("string"), lit(":epoch")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(salted, col(idCol))
    docs.select(col(idCol), col(stratumCol))
      .withColumn("_hmin", row_number().over(w) === 1)
      .join(broadcast(spine), stratumCol)
      .filter(col("epoch_idx") < col("_full") ||
        (col("_has_rem") && (salted < col("_rem64k") || col("_hmin"))))
      .select(col(idCol), col(stratumCol), col("epoch_idx"))
  }

  /** Domain reweighting by deterministic downsampling: given target
    * mixture proportions per stratum (e.g. language or source domain —
    * the knob every LLM data pipeline tunes), keep the LARGEST subset
    * achieving exactly those proportions. The feasible sample size is
    * `S = min_l(count_l / share_l)`; each stratum keeps rows whose key
    * hash falls under `share_l · S / count_l` of the hash space —
    * scan-only selection (no shuffle of the data), reproducible across
    * engines/re-runs like every operator here. Strata absent from
    * `targets` are dropped. The per-stratum counts are a tiny aggregate
    * broadcast back; at 100 TB that is one metadata-sized exchange.
    * All scalar arithmetic (no float SUMS) — both engines compute
    * bit-identical doubles, so the integer cut compares identically. */
  def domainResample(df: DataFrame, targets: Seq[(String, Double)],
                     stratumCol: String = "lang",
                     keyCol: String = "doc_id"): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "domainResample needs positive target shares")
    require(targets.map(_._1).distinct.size == targets.size,
      "domainResample targets must name each stratum once — a duplicate " +
        "would fan out the cuts join and break the requested mixture")
    import df.sparkSession.implicits._
    val shares = targets.toDF(stratumCol, "_share")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_n"))
    // global min over a handful of stratum rows: an empty-frame window
    // is the cheapest way to keep it in one plan (single-row exchange)
    val cuts = counts.join(shares, stratumCol)
      .withColumn("_scale",
        min(col("_n") / col("_share")).over(Window.partitionBy()))
      .withColumn("_cut", // explicit floor: DuckDB CAST(double) rounds, Spark truncates
        floor(col("_share") * col("_scale") / col("_n") * 65536).cast("long"))
      .select(col(stratumCol), col("_cut"))
    df.join(broadcast(cuts), stratumCol)
      .filter(md5Bucket64k(col(keyCol)) < col("_cut"))
      .drop("_cut")
  }
}
