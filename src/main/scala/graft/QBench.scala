package graft
import org.apache.spark.sql.SparkSession
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // honor the same env as Bench so per-query drill-downs are measured
    // under the SAME parallelism as the BENCH numbers they're compared to
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle partitions sized separately from parallelism: at the big
    // scale-rehearsal SFs (x1000) a 32-partition shuffle of the shingle
    // explosion overflows execution memory — the same partition-sizing
    // knob a real cluster job turns (defaults to cpus, the bench shape)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val names = args.toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}" +
        s" — valid names: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { spark.read.parquet(s"$sfDir/documents.parquet").selectExpr("count(distinct lower(text))").collect() } catch { case _: Throwable => () }
    for (rep <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      // noop sink, not count(): same no-column-pruning rationale as Bench
      try {
        SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"QBENCH rep$rep $n ${(System.nanoTime() - t0) / 1e9}%.3f s")
      } catch { case e: Throwable =>
        // a single failing query must not take out the rest of the sweep
        println(f"QBENCH rep$rep $n FAILED ${(System.nanoTime() - t0) / 1e9}%.3f s ($e)")
      }
    }
    spark.stop()
  }
}
