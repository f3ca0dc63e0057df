package graft

import graft.operators.{Decontaminate, Dedup, Embedding, Graph, Retrieval, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-5 operators: simhash Hamming pairs, weighted sampling,
  * PageRank, Bloom decontamination, k-means sufficient statistics,
  * token entropy, contrastive triplets, RRF fusion. */
class GraphSketchSamplingSpec extends SparkSpec {
  import spark.implicits._

  // ---- simhashPairs ----------------------------------------------------

  private def nearDupCorpus = {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "completely different content about spark shuffles and parquet footers"
    val va = (0 until 8).map(i => (i.toLong, s"$a v$i"))
    val vb = (0 until 8).map(i => ((100 + i).toLong, s"$b v$i"))
    (va ++ vb).toDF("doc_id", "text")
  }

  test("simhashPairs equals brute force over fingerprints at the exact-recall threshold") {
    val docs = nearDupCorpus
    val fps = Dedup.simhash60(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h)).toSet
    val got = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // pigeonhole: ≤3 differing bits leave one of the 4 byte bands intact,
    // so banding loses nothing at this threshold
    assert(got == expected)
    assert(got.nonEmpty) // the mutated copies really are near-dups
    assert(got.forall { case (a, b, _) => a < b })
  }

  test("simhashPairsCapped: exact parity above the cap, bounded keepers below it") {
    val docs = nearDupCorpus
    val exact = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // cap far above any bucket width: output must be identical
    val wide = Dedup.simhashPairsCapped(docs, maxHamming = 3, cap = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(wide == exact, "an unreached cap must not change the pair set")
    // cap 1: every emitted pair's SOURCE is its bucket's smallest id, so
    // within each near-dup group only the earliest doc pairs forward —
    // a strict subset, still covering every later doc at least once
    val capped = Dedup.simhashPairsCapped(docs, maxHamming = 3, cap = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped.subsetOf(exact))
    assert(capped.size < exact.size, "the cap must genuinely bite on 8-wide groups")
    // exact in-memory reference of the cap semantics: per (band, bucket)
    // the cap smallest ids are the only pair sources
    val fps = Dedup.simhash60(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val buckets = fps.toSeq.flatMap { case (id, fp) =>
      (0 until 4).map(b => ((b, (fp >> (b * 15)) & 32767L), id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val want = (for {
      (_, ids) <- buckets.toSeq
      a <- ids.take(1); b <- ids if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(capped == want, "capped pairs must equal the keeper-rank reference")
  }

  test("simhashPairs respects the Hamming threshold") {
    val got = Dedup.simhashPairs(nearDupCorpus, maxHamming = 1).collect()
    assert(got.forall(_.getInt(2) <= 1))
  }

  // ---- weightedSample --------------------------------------------------

  test("weightedSample is deterministic, bounded, and drops nonpositive weights") {
    val docs = (1 to 40).map(i => (i.toLong, if (i % 10 == 0) 0L else i.toLong * 7))
      .toDF("doc_id", "w")
    val s1 = Sampling.weightedSample(docs, 10, "w", "doc_id").collect()
      .map(_.getLong(0)).toSet
    val s2 = Sampling.weightedSample(docs, 10, "w", "doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.size == 10)
    assert(s1.forall(_ % 10 != 0)) // zero-weight rows can never be drawn
    val all = Sampling.weightedSample(docs, 100, "w", "doc_id").collect()
    assert(all.length == 36) // 40 minus the four zero-weight rows
  }

  test("weightedSample ranks by the Efraimidis-Spirakis key") {
    val docs = (1 to 30).map(i => (i.toLong, 1000L)).toDF("doc_id", "w")
    val got = Sampling.weightedSample(docs, 5, "w", "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // keys are ln(u)/w ≤ 0 and the selected 5 are the largest overall
    val keys = Sampling.weightedSample(docs, 30, "w", "doc_id")
      .collect().map(r => r.getDouble(2)).sorted(Ordering[Double].reverse)
    assert(got.forall(_._2 <= 0.0))
    assert(got.map(_._2).sorted(Ordering[Double].reverse).sameElements(keys.take(5)))
  }

  // ---- pageRank --------------------------------------------------------

  test("pageRank matches the hand-computed integer fixed point on a star graph") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Graph.pageRank(nodes, pairs, iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // N=4: teleport = 15e6/400 = 37500, pr0 = 250000; three exact integer
    // iterations (see scaladoc formula) give:
    assert(got(1L) == ((2L, 435405L)))
    assert(got(2L) == ((1L, 157296L)))
    assert(got(3L) == ((1L, 157296L)))
    assert(got(4L) == ((0L, 37500L))) // dangling: teleport share only
  }

  test("pageRank on a symmetric pair is symmetric and mass-bounded") {
    val nodes = Seq(1L, 2L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val got = Graph.pageRank(nodes, pairs, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == got(2L))
    // truncating integer division only ever LOSES mass
    assert(got.values.sum <= 2L * 1000000L / 2)
  }

  // ---- bloomDecontam ---------------------------------------------------

  test("bloomDecontam has no false negatives and flags only non-members as FPs") {
    val docs = (1 to 60).map(i => (i.toLong, s"document number $i body"))
      .toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" % 5 === 0).select($"text")
    val r = Decontaminate.bloomDecontam(docs, bench).collect()
      .map(x => x.getLong(0) -> ((x.getBoolean(1), x.getBoolean(2), x.getBoolean(3))))
      .toMap
    assert(r.size == 60)
    r.foreach { case (id, (hit, exact, fp)) =>
      assert(exact == (id % 5 == 0))
      if (exact) assert(hit)    // a Bloom filter never misses a member
      assert(fp == (hit && !exact))
    }
  }

  test("bloomDecontam with a tiny filter shows false positives but never negatives") {
    val docs = (1 to 80).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" <= 20).select($"text")
    val r = Decontaminate.bloomDecontam(docs, bench, m = 64, k = 2).collect()
      .map(x => (x.getBoolean(1), x.getBoolean(2), x.getBoolean(3)))
    assert(r.forall { case (hit, exact, _) => !exact || hit })
    assert(r.exists { case (hit, exact, fp) => hit && !exact && fp }) // m=64 must FP
  }

  // ---- kmeansStep ------------------------------------------------------

  test("kmeansStep statistics equal a Scala brute-force replay") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.9f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)), (4L, Seq(0.1f, 0.9f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 1.0f)), (6L, Seq(0.0f, 0.1f, 0.9f)),
      (7L, Seq(0.0f, 0.0f, 0.0f)) // zero-norm: excluded
    ).toDF("vec_id", "embedding")
    val k = 2
    val got = Similarity.kmeansStep(vecs, kCents = k).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap

    // replay: same hash-minimal codebook, same rounded-cosine argmax
    val nz = vecs.filter(expr("aggregate(transform(embedding, x -> double(x) * double(x)), 0D, (a, x) -> a + x) > 0"))
    val cb = nz
      .orderBy(Sampling.md5Bucket64k($"vec_id"), $"vec_id").limit(k)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toSeq)
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val d = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val members = nz.collect().map(r => r.getSeq[Float](1).map(_.toDouble).toSeq)
    val expected = members
      .map { v =>
        val scores = cb.map(c => cos(v, c))
        (scores.indexOf(scores.max), v)
      }
      .flatMap { case (cell, v) => v.zipWithIndex.map { case (x, d) => (cell, d, x) } }
      .groupBy { case (cell, d, _) => (cell, d) }
      .map { case (key, xs) =>
        key -> ((xs.size.toLong, xs.map { case (_, _, x) =>
          BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }.sum))
      }
    assert(got == expected)
    // every nonzero vector lands in exactly one cell
    assert(got.collect { case ((_, 0), (n, _)) => n }.sum == 6L)
  }

  // ---- tokenEntropy ----------------------------------------------------

  test("tokenEntropy matches hand-computed Shannon entropy") {
    val docs = Seq(
      (1L, "a a b b"),      // H = ln 2
      (2L, "x x x x"),      // degenerate: H = 0
      (3L, "a b c d")       // uniform over 4: H = ln 4
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tokenEntropy(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((4L, 2L, 0.6931)))
    assert(r(2L) == ((4L, 1L, 0.0)))
    assert(r(3L) == ((4L, 4L, 1.3863)))
  }

  // ---- invertedIndex ---------------------------------------------------

  test("inverted index: sorted postings, df bounds, stopwords dropped") {
    val docs = Seq(
      (5L, "spark the parquet"), (1L, "spark shuffle"),
      (3L, "spark parquet"), (2L, "hapax")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.invertedIndex(docs, minDf = 2, maxDf = 2).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getString(2)))).toMap
    // "spark" df=3 > maxDf, "shuffle"/"hapax" df=1 < minDf, "the" is a stopword
    assert(r == Map("parquet" -> ((2L, "[3,5]"))))
  }

  // ---- pmiCooccurrence -------------------------------------------------

  test("PMI co-occurrence matches the hand computation") {
    val docs = Seq(
      (1L, "xx yy"), (2L, "xx yy"), (3L, "xx zz"), (4L, "ww qq")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.pmiCooccurrence(docs, vocabSize = 10, minPairs = 2).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getDouble(5)))
    // only (xx, yy) co-occurs twice: pmi = ln(4*2/(3*2)) = ln(4/3)
    assert(r.toSeq == Seq(("xx", "yy", 2L, 3L, 2L, 0.287682)))
  }

  // ---- contrastiveTriplets ---------------------------------------------

  test("contrastive triplets: positive is the nearest same-label, negative crosses labels") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 1), (1L, Seq(0.9f, 0.1f), 1), (2L, Seq(0.5f, 0.5f), 1),
      (3L, Seq(0.0f, 1.0f), 2), (4L, Seq(0.1f, 0.9f), 2),
      (5L, Seq(0.0f, 0.0f), 2)  // zero-norm: never selected
    ).toDF("vec_id", "embedding", "label")
    val labels = Map(0L -> 1, 1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2)
    val r = Embedding.contrastiveTriplets(vecs, nAnchors = 5).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getLong(3)))).toMap
    assert(r.size == 5)
    r.foreach { case (a, (p, score, n)) =>
      assert(p != a && labels(p) == labels(a), s"positive of $a must share its label")
      assert(labels(n) != labels(a), s"negative of $a must cross labels")
      assert(n != 5L, "zero-norm vector must never be drawn")
      assert(score >= -1.0 && score <= 1.0)
    }
    // anchor 0 (1,0): same-label candidates are 1 (cos .9938) and 2 (cos .7071)
    assert(r(0L)._1 == 1L)
    // determinism
    val r2 = Embedding.contrastiveTriplets(vecs, nAnchors = 5).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getLong(3)))).toMap
    assert(r == r2)
  }

  // ---- rrfFuse ---------------------------------------------------------

  test("RRF fusion matches the hand-computed reciprocal sums") {
    val a = Seq((1, 10L, 1), (1, 20L, 2)).toDF("question_id", "doc_id", "rank")
    val b = Seq((1, 20L, 1), (1, 30L, 2)).toDF("question_id", "doc_id", "rank")
    val r = Retrieval.rrfFuse(a, b, k = 3).collect()
      .map(x => (x.getLong(1), x.getInt(2), x.getInt(3), x.getDouble(4), x.getInt(5)))
      .sortBy(_._5)
    // d20 in both lists: 1/62 + 1/61; d10 only in A: 1/61; d30 only in B: 1/62
    assert(r(0) == ((20L, 2, 1, 0.032522, 1)))
    assert(r(1) == ((10L, 1, 0, 0.016393, 2)))
    assert(r(2) == ((30L, 0, 2, 0.016129, 3)))
  }
}
