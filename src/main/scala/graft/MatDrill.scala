package graft
import org.apache.spark.sql.SparkSession

/** Interleaved A/B drill for the materialization seam
  * ([[graft.operators.Mat]]): times each named query under
  * mode=eager and mode=lazy ALTERNATING inside one JVM, so host
  * weather and JIT state cancel out — the per-query effect of the
  * eager head-job barrier is the min-over-rounds difference. Usage:
  * `runMain graft.MatDrill <rounds> [modes=a,b,...] <query...>` —
  * modes default to eager,lazy; `none` is the no-materialization
  * control (prices the repeated-subtree cost a site exists to remove). */
object MatDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val modes = args.drop(1).headOption.filter(_.startsWith("modes="))
      .map(_.stripPrefix("modes=").split(",").toSeq)
      .getOrElse(Seq("eager", "lazy"))
    val names = args.drop(1).dropWhile(_.startsWith("modes=")).toSeq
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("count(distinct lower(text))").collect()
    catch { case _: Throwable => () }
    val acc = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    // MAT_CONF_KEY generalizes the drill to any session-conf A/B (e.g.
    // a query-level structure gate), defaulting to the Mat seam's mode
    val confKey = sys.env.getOrElse("MAT_CONF_KEY", graft.operators.Mat.ModeKey)
    for (r <- 1 to rounds; name <- names; mode <- modes) {
      spark.conf.set(confKey, mode)
      val t0 = System.nanoTime()
      val ok = try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save(); true
      } catch { case e: Throwable =>
        System.err.println(s"[matdrill] $name/$mode: $e"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      if (ok) acc((name, mode)) = sec :: acc((name, mode))
      println(f"MATREP r$r $name%-24s $mode%-5s $sec%6.2f s")
    }
    for (name <- names; mode <- modes) {
      val ts = acc((name, mode))
      if (ts.nonEmpty)
        println(f"MAT $name%-24s $mode%-5s min=${ts.min}%6.2f median=${ts.sorted.apply(ts.size / 2)}%6.2f  (${ts.reverse.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
