package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Dedup
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.{NearDoc, NearDupHit}

/** The UNIFIED cap contract across the batch and streaming near-dup
  * operators: [[Dedup.simhashPairsCapped]] (keepers = the `cap`
  * smallest ids per band bucket) and
  * [[StreamingIngest.streamingNearDups]] (state = the `cap` most
  * RECENT fingerprints, FIFO) run the SAME random corpora under
  * IDENTICAL caps. While no bucket exceeds the cap the two caps are
  * both no-ops, so the operators must agree exactly — the generative
  * property below pins that agreement in the form both sides share
  * (the earliest-keeper resolution per flagged doc, plus hit-level
  * soundness). Past the cap their retention policies genuinely
  * diverge (smallest-id rank vs FIFO recency); the directed case pins
  * that divergence so it stays a documented contract, not an accident.
  */
class SimhashCapParitySpec extends SparkSpec {
  import spark.implicits._

  /** n deterministic draws from g (seeded — no flaky CI). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1300L + i)))

  /** Largest (band, bucket) occupancy of the corpus's 4-band SimHash
    * banding — the threshold at which either cap starts to bite. */
  private def maxBucketOccupancy(docs: org.apache.spark.sql.DataFrame): Long =
    docs.select(Dedup.simhash60Col(col("text")).as("fp"))
      .select(posexplode(array((0 until 4).map(b =>
        shiftright(col("fp"), b * 15).bitwiseAND(lit(32767L))): _*))
        .as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket")).count()
      .agg(max(col("count"))).head().getLong(0)

  private def runStream(corpus: Seq[(Long, String)], cap: Int, name: String)
      : (Seq[NearDupHit], Long) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[NearDoc]
    val evicted = spark.sparkContext.longAccumulator(s"parity-evict-$name")
    val q = StreamingIngest.streamingNearDups(input.toDS(), perBucketCap = cap,
        evictions = Some(evicted))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // epoch = id so in-batch processing order equals id order — the
      // arrival order under which the batch operator's id-rank keepers
      // and the stream's insertion order describe the same history
      input.addData(corpus.map { case (id, t) => NearDoc(id, t, id) }: _*)
      q.processAllAvailable()
      (spark.table(name).as[NearDupHit].collect().toSeq, evicted.value)
    } finally q.stop()
  }

  test("within the cap, batch and stream resolve identical earliest keepers " +
      "(generative, seeded)") {
    // word pool small enough that copies and one-word edits near-dup
    val pool = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val freshDoc = Gen.choose(4, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(pool)).map(_.mkString(" ")))
    val corpusGen: Gen[Seq[String]] = for {
      n <- Gen.choose(8, 20)
      texts <- Gen.listOfN(n, freshDoc)
      // splice in near-dups: every third doc becomes a copy of an
      // earlier one with its first word swapped (hamming small but
      // usually nonzero) and every fourth an exact copy (hamming 0)
      edited = texts.zipWithIndex.map {
        case (t, i) if i >= 2 && i % 4 == 0 => texts(i / 2)
        case (t, i) if i >= 2 && i % 3 == 0 =>
          val w = texts(i / 2).split(" ")
          (pool(i % pool.size) +: w.drop(1)).mkString(" ")
        case (t, _) => t
      }
    } yield edited
    samples(corpusGen, 6).zipWithIndex.foreach { case (texts, i) =>
      val corpus = texts.zipWithIndex.map { case (t, j) => (j + 1L, t) }
      val docsDF = corpus.toDF("doc_id", "text")
      // tight cap: exactly the fullest bucket's occupancy, so the cap
      // is live code on both sides yet evicts/demotes nothing
      val cap = math.max(1L, maxBucketOccupancy(docsDF)).toInt
      val batch = Dedup.simhashPairsCapped(docsDF, cap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val pairSet = batch.map { case (a, b, h) => (a, b) -> h }.toMap
      val (hits, evictions) = runStream(corpus, cap, s"parity_gen_$i")
      assert(evictions === 0L, s"draw $i: cap=$cap must not evict")
      // soundness: every stream hit is a batch pair at the same distance
      hits.foreach { h =>
        assert(pairSet.get((h.dup_of, h.doc_id)).contains(h.hamming),
          s"draw $i: stream hit $h is not a batch pair")
      }
      // parity: per flagged doc, both resolve the same earliest keeper
      val batchKeeper = batch.groupBy(_._2).map { case (b, ps) =>
        b -> ps.map(_._1).min }
      val streamKeeper = hits.groupBy(_.doc_id).map { case (d, hs) =>
        d -> hs.map(_.dup_of).min }
      assert(streamKeeper === batchKeeper,
        s"draw $i (cap=$cap): earliest-keeper maps diverged")
    }
  }

  test("past the cap the retention policies diverge exactly as documented: " +
      "same flagged docs, rank-keeper vs FIFO-keeper") {
    val corpus = Seq(1L, 2L, 3L).map(i => (i, "same words here")) :+
      (4L, "completely different vocabulary entirely")
    val docsDF = corpus.toDF("doc_id", "text")
    // batch cap=1: only id 1 is a pair source per bucket
    val batch = Dedup.simhashPairsCapped(docsDF, cap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((1L, 2L), (1L, 3L)),
      "batch keeps the smallest-id keeper past the cap")
    // stream cap=1: FIFO — doc 2 evicts 1, so doc 3 resolves to 2
    val (hits, evictions) = runStream(corpus, cap = 1, "parity_overcap")
    val streamPairs = hits.map(h => (h.dup_of, h.doc_id)).distinct.toSet
    assert(streamPairs === Set((1L, 2L), (2L, 3L)),
      "stream keeps the most-recent keeper past the cap")
    assert(evictions > 0L, "over-cap stream must report its evictions")
    // the invariant both policies preserve: the same DOCS are flagged
    assert(streamPairs.map(_._2) === batch.map(_._2))
  }
}
