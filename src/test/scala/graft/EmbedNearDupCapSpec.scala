package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Similarity}

/** The per-bucket keeper cap on the embedding near-dup pair generator
  * ([[Dedup.embeddingNearDupsCapped]]) — the r20 verdict's last
  * uncapped-pair fix. Contract (the [[SimhashCapParitySpec]] shape on
  * the embedding tier):
  *
  *  1. buckets within the cap ⇒ output EXACTLY equals the uncapped
  *     [[Dedup.embeddingNearDups]] (generative, seeded);
  *  2. a hostile degenerate bucket (every vector near-identical — the
  *     exact population a dedup pass exists to find) stays O(n · cap):
  *     pair count = cap·n − cap·(cap+1)/2, never n·(n−1)/2, and every
  *     vector past the cap still resolves to the smallest-id keeper;
  *  3. the capped output is always a SUBSET of the exact pairs, with
  *     id_a restricted to per-bucket rank ≤ cap — each dropped pair is
  *     a stated-contract recall loss, not a wrong row.
  */
class EmbedNearDupCapSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(2100L + i)))

  private def maxBucketOccupancy(vecs: org.apache.spark.sql.DataFrame): Long =
    vecs.select(Similarity.signBucket(col("embedding"), 4).as("b"))
      .groupBy("b").count().agg(max("count")).head().getLong(0)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("buckets within the cap: capped == exact (generative, seeded)") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-1.0, 1.0)).map(_.map(_.toFloat))
    val corpusGen = for {
      n <- Gen.choose(6, 24)
      vs <- Gen.listOfN(n, vecGen)
    } yield vs
    samples(corpusGen, 6).foreach { vs =>
      val vecs = vs.zipWithIndex.map { case (v, i) => (i + 1L, v) }
        .toDF("vec_id", "embedding")
      val cap = math.max(1L, maxBucketOccupancy(vecs)).toInt
      val exact = pairs(Dedup.embeddingNearDups(vecs, threshold = 0.2))
      val capped = pairs(Dedup.embeddingNearDupsCapped(vecs, threshold = 0.2, cap = cap))
      assert(capped === exact, s"cap=$cap (== fullest bucket) must be a no-op")
    }
  }

  test("hostile degenerate bucket: O(n·cap) pairs, keeper still resolves") {
    // 40 near-identical vectors (tiny per-id jitter on one component
    // keeps them distinct but cosine ≈ 1): ONE bucket owns everything —
    // the uncapped join is n·(n−1)/2 = 780 pairs, quadratic in the
    // duplicate population; the cap bounds it.
    val n = 40
    val cap = 3
    val vecs = (1 to n).map(i =>
      (i.toLong, Seq(1.0f, 0.5f, 0.25f, 0.125f + i * 1e-4f)))
      .toDF("vec_id", "embedding")
    assert(maxBucketOccupancy(vecs) === n.toLong)
    val exact = pairs(Dedup.embeddingNearDups(vecs, threshold = 0.9))
    assert(exact.size === n * (n - 1) / 2)
    val capped = pairs(Dedup.embeddingNearDupsCapped(vecs, threshold = 0.9, cap = cap))
    // sources = ids 1..cap, each paired with every later id
    assert(capped.size === cap * n - cap * (cap + 1) / 2)
    assert(capped.subsetOf(exact))
    assert(capped.forall(_._1 <= cap), "pair sources must be the cap smallest ids")
    // the dedup decision survives the cap: every non-keeper vector is
    // still flagged, and its earliest keeper is the bucket's smallest id
    val keeperOf = capped.groupBy(_._2).map { case (b, ps) => b -> ps.map(_._1).min }
    assert(keeperOf.keySet === (2 to n).map(_.toLong).toSet)
    assert(keeperOf.values.forall(_ === 1L))
  }

  test("capped output is a rank-restricted subset of the exact pairs") {
    val vecs = (1 to 30).map(i => (i.toLong, Seq(
      (if (i % 2 == 0) 1.0f else -1.0f), 0.3f, -0.2f, 0.4f + i * 1e-3f)))
      .toDF("vec_id", "embedding")
    val exact = pairs(Dedup.embeddingNearDups(vecs, threshold = 0.2))
    val capped = pairs(Dedup.embeddingNearDupsCapped(vecs, threshold = 0.2, cap = 2))
    assert(capped.subsetOf(exact))
    // ids 1,3 are the odd bucket's two smallest; 2,4 the even's
    assert(capped.forall(p => Set(1L, 2L, 3L, 4L).contains(p._1)))
  }
}
