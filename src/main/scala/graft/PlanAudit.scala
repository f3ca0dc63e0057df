package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
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
