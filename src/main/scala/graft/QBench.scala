package graft
import org.apache.spark.sql.SparkSession
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { spark.read.parquet(s"$sfDir/documents.parquet").selectExpr("count(distinct lower(text))").collect() } catch { case _: Throwable => () }
    for (rep <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"QBENCH rep$rep $n ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
