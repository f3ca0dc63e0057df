package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // args: [sfDir] [queryName...] — default sf0.001, all queries. An
    // explicit sfDir enables the cross-SF plan-FLIP audit: plan shapes
    // (shuffle/join/agg node counts) should be SF-invariant for
    // scale-safe queries, so `diff <(PlanAudit sf0.1) <(PlanAudit sf1)`
    // must be empty — a join that flips broadcast→SMJ or a new exchange
    // at bigger data is exactly the regression this audit exists to
    // catch before a 100x scale-up does.
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1))
      .foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.explainString(ExplainMode.fromString("simple"))
        def c(s: String) = s.r.findAllIn(p).size
        // shuffle Exchange only (not BroadcastExchange); hash aggregates
        // of either flavor counted separately from their Object variant
        println(f"AUDIT $name%-22s shuf=${c("(?<!Broadcast)(?<!Reused)Exchange")}%2d bex=${c("BroadcastExchange")}%d smj=${c("SortMergeJoin")}%d bhj=${c("BroadcastHashJoin")}%d bnlj=${c("BroadcastNestedLoopJoin")}%d win=${c("(?<!Group)Window(?!GroupLimit)")}%d gen=${c("Generate")}%d agg=${c("(?<!Object)HashAggregate")}%d oagg=${c("ObjectHashAggregate")}%d")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
