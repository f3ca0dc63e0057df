package graft

import org.apache.spark.sql.SparkSession

/** EXECUTED-plan audit — the adaptive (post-AQE) complement to
  * [[PlanAudit]], which prints the static plan Catalyst committed to
  * BEFORE runtime statistics existed. AQE can re-plan a sort-merge
  * join back to broadcast when a side's real shuffle size is small, so
  * a static broadcast→SMJ demote (SCALING.md's ×100 flip class) may or
  * may not survive execution; this main executes each query's OWN
  * QueryExecution (not a separate write job — a `df.write` builds its
  * own QE, leaving `df.queryExecution` un-executed and its adaptive
  * plan unfinalized) and prints the join flavors of the FINAL adaptive
  * plan, refusing to count a plan that has not reached
  * `isFinalPlan=true`. Measured round 13 at sf10 (SCALING.md): the
  * corpus-derived demotes survive finalization, while AQE re-promotes
  * exactly the sides whose runtime size stays small (`delete_by_ids`'
  * tombstones at every SF; `clean_corpus`'s lone static smj at sf0.1).
  *
  * Usage: `runMain graft.AqeProbe <sfDir> <query>...`
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AqeProbe <sfDir> <query>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.drop(1)) {
      try {
        val df = SparkEntry.queries(name)(spark, args(0))
        val qe = df.queryExecution
        // Drive THIS QueryExecution to completion so its
        // AdaptiveSparkPlanExec finalizes — discard rows on executors.
        qe.toRdd.foreachPartition(_ => ())
        // the finalized AdaptiveSparkPlanExec stringifies BOTH the final
        // plan and an "== Initial Plan ==" section — count only the
        // former, or every flavor is double-counted (or worse, the
        // initial flavor masks the re-planned one)
        val p = qe.executedPlan.toString.split("== Initial Plan ==")(0)
        val adaptive = p.contains("AdaptiveSparkPlan")
        if (adaptive && !p.contains("isFinalPlan=true")) {
          println(s"AQEFINAL $name NOT-FINAL (adaptive plan did not finalize)")
        } else {
          def c(s: String) = s.r.findAllIn(p).size
          // win counts full Window exec nodes; wgl the WindowGroupLimit
          // pushdown variant (a rank<=k filter that partial-limits
          // map-side — the acceptable capped-bucket shape, distinct
          // from the skew-prone unbounded window)
          println(f"AQEFINAL $name%-22s smj=${c("SortMergeJoin")}%d " +
            f"bhj=${c("BroadcastHashJoin")}%d bnlj=${c("BroadcastNestedLoopJoin")}%d " +
            f"shj=${c("ShuffledHashJoin")}%d win=${c("\\bWindow\\b")}%d " +
            f"wgl=${c("WindowGroupLimit")}%d final=${if (adaptive) "aqe" else "static"}%s")
        }
      } catch { case e: Throwable =>
        println(s"AQEFINAL $name ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
