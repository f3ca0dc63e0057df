package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Decade ladder for the embedding near-dup pair join (the MediaDrill
  * image_join pattern on the vector tier): a `hostilePct` share of the
  * corpus is near-identical vectors — one sign bucket owns them all,
  * the spacer-GIF class of the embedding world — and the rest spread
  * by deterministic pseudo-random components. Reports pairs and
  * seconds for [[Dedup.embeddingNearDupsCapped]] vs the uncapped
  * [[Dedup.embeddingNearDups]] at each rung; `EMBED_SKIP_UNCAPPED`
  * skips the quadratic leg at the rung where it stops being worth the
  * wait — the point of the exercise is that the CAPPED column keeps
  * scaling. Env: `EMBED_DOCS` (base 10 000), `EMBED_HOSTILE_PCT`
  * (default 10). */
object EmbedDrill {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("EMBED_DOCS", "10000").toLong
    val hostilePct = sys.env.getOrElse("EMBED_HOSTILE_PCT", "10").toInt
    val skipUncapped = sys.env.contains("EMBED_SKIP_UNCAPPED")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(df: DataFrame): (Long, Double) = {
      // consume every row in the timed region (foreachPartition with an
      // ignored iterator leaves the final join stage lazy-unevaluated)
      val qe = df.queryExecution
      val (_, s) = timed(
        qe.toRdd.foreachPartition(it => { var n = 0L; it.foreach(_ => n += 1); () }))
      (df.count(), s)
    }

    val m = math.max(2L, nDocs * hostilePct / 100)
    // hostile block: all-positive near-identical vectors (bucket "1111",
    // cosine ≈ 1 — the duplicate population); the rest pseudo-random
    // signs via xxhash64 bits, tiny per-id jitter keeps rows distinct
    val j = col("id").cast("double") * 1e-9
    def bit(k: Int) = when(
      shiftright(xxhash64(col("id")), k).bitwiseAND(lit(1L)) === 1L, 1.0).otherwise(-1.0)
    val vecs = spark.range(nDocs).select(col("id").as("vec_id"),
        when(col("id") < m,
          array(lit(1.0) + j, lit(0.5), lit(0.25), lit(0.125)))
          .otherwise(array(bit(0) + j, bit(1), bit(2), bit(3)))
          .cast("array<float>").as("embedding"))
      .localCheckpoint()
    for (rep <- 1 to 2) {
      val (cn, cs) = run(Dedup.embeddingNearDupsCapped(vecs, threshold = 0.9, cap = 64))
      println(f"EMBEDDRILL pair_join capped   rep$rep docs=$nDocs hostile=$m " +
        f"pairs=$cn time=$cs%.1f s")
      if (!skipUncapped) {
        val (un, us) = run(Dedup.embeddingNearDups(vecs, threshold = 0.9))
        println(f"EMBEDDRILL pair_join uncapped rep$rep docs=$nDocs hostile=$m " +
          f"pairs=$un time=$us%.1f s")
      }
    }
    spark.stop()
  }
}
