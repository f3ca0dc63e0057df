package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes `.explain("formatted")` output for named queries to files —
  * the r21 optimization round's before/after plan evidence
  * (`plans/r21/<query>_before.txt` / `..._after.txt`). Usage:
  * `runMain graft.PlanDump <outDir> <suffix> [query...]` — default SF
  * dir from SPARK_GRAFT_SF_DIR (sf0.1), all queries when none named.
  * Plans are captured at the bench's own core count / shuffle width so
  * the files show exactly the shape the timed runs execute. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r21")
    val suffix = args.drop(1).headOption.getOrElse("before")
    val only = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1))
      .foreach { case (name, fn) =>
        try {
          val p = fn(spark, sfDir).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
            p.getBytes("UTF-8"))
          println(s"PLAN $name -> $outDir/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          println(s"PLAN $name ERROR ${e.getMessage.take(120)}") }
      }
    spark.stop()
  }
}
