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
        println(f"AUDIT $name%-22s ex=${c("Exchange")}%2d smj=${c("SortMergeJoin")}%d bhj=${c("BroadcastHashJoin")}%d bnlj=${c("BroadcastNestedLoopJoin")}%d win=${c("Window")}%d gen=${c("Generate")}%d agg=${c("HashAggregate")}%d")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
