package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the near-dup candidate graph (the same edge
  * source [[Dedup.dupClusters]] / [[Dedup.connectedComponents]] consume):
  * document centrality identifies the canonical/most-connected member of
  * a duplicate neighborhood, a standard signal when choosing which copy
  * of near-duplicated content to keep in a training corpus.
  */
object Graph {

  /** Fixed-iteration PageRank in exact integer micro-units.
    *
    * Undirected near-dup pairs become two directed edges; each iteration
    * is one equi-join (rank → outgoing contributions) plus one hash
    * aggregate (contributions → incoming sum) — the standard message-
    * passing shape, unrolled `iters` times into a single lazy plan. At
    * cluster scale each iteration shuffles O(edges) rows partitioned by
    * vertex id; a Pregel runtime would do exactly the same exchange.
    *
    * All arithmetic is integer: ranks live in micro-units (1e6 = rank
    * 1.0) and the damping update is `teleport + (dampPct · insum) div
    * 100` with truncating integer division — order-free and bit-identical
    * in any engine, where a floating-point formulation would drift with
    * aggregation order. Mass lost to truncation and to dangling vertices
    * (no edges — they keep only the teleport share) is NOT redistributed:
    * the conventional simplification, stated here because ranks then sum
    * to slightly less than 1e6·N.
    *
    * `nodes`/`pairs` follow the dedup-family contract: `idCol` vertex
    * ids, pairs as distinct (id_a < id_b) rows.
    */
  def pageRank(nodes: DataFrame, pairs: DataFrame, iters: Int = 3,
               dampPct: Int = 85, idCol: String = "doc_id"): DataFrame = {
    require(iters >= 1 && dampPct >= 0 && dampPct <= 100)
    // Both sides of every iteration reuse these — checkpoint once
    // (localCheckpoint over persist: blocks are reclaimed on GC, no
    // CacheManager entry leaks from a library function).
    val edges = Dedup.symmetricEdges(pairs, srcName = "src", dstName = "dst")
      .localCheckpoint()
    val base = nodes.select(col(idCol).as("id")).localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // N is a driver-held scalar (metadata-sized, like the PQ codebook)
    val nNodes = base.count()
    require(nNodes > 0, "pageRank needs a non-empty nodes table")
    val teleport = (100L - dampPct) * 1000000L / (100L * nNodes)
    var pr = base.withColumn("pr6", lit(1000000L / nNodes))
    for (_ <- 1 to iters) {
      val contrib = pr.join(deg, col("id") === col("src"))
        .select(col("id").as("csrc"), expr("pr6 div deg").as("c6"))
      val insum = edges.join(contrib, col("src") === col("csrc"))
        .groupBy(col("dst")).agg(sum(col("c6")).as("in6"))
      pr = base.join(insum, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(teleport) + expr(s"($dampPct * coalesce(in6, CAST(0 AS BIGINT))) div 100"))
            .as("pr6"))
    }
    pr.join(deg, col("id") === col("src"), "left")
      .select(col("id").as(idCol), coalesce(col("deg"), lit(0L)).as("deg"),
        col("pr6"))
  }
}
