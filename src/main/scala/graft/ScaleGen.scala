package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-derivative generator for the rehearsals in SCALING.md: writes
  * `<outDir>/{documents,embeddings,events}.parquet` as `factor`-fold
  * replicas of a source SF dir (ids re-salted per replica so dedup /
  * join keys stay unique), and copies the remaining tables verbatim.
  *
  * Replication semantics: each replica r ∈ [0, factor) shifts every id
  * column by `r · SALT` (SALT = 10^12, far above any real id), so a ×N
  * corpus has N copies of every document — which makes DEDUP workloads
  * superlinear BY CONSTRUCTION (every doc becomes an N-wide duplicate
  * cluster) while count-, join-, and agg-bound workloads scale
  * linearly. Event timestamps are left unshifted: the time span stays
  * fixed as density grows, like a busier day rather than a longer one.
  *
  * Round 11 built its ×10 derivative (`target/sf1`) with a throwaway
  * job; this main makes the recipe reproducible for the ×100 tier and
  * beyond: `sbt "runMain graft.ScaleGen /root/testdata/sf0.1
  * target/sf10 100"`.
  */
object ScaleGen {
  private val Salt = 1000000000000L

  private def replicate(df: DataFrame, factor: Int, idCols: Seq[String]): DataFrame = {
    val withRep = df.crossJoin(
      df.sparkSession.range(factor.toLong).select(col("id").as("__rep")))
    idCols.foldLeft(withRep)((d, c) =>
      d.withColumn(c, col(c) + col("__rep") * Salt))
      .drop("__rep")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcSfDir> <outDir> <factor>")
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    require(factor >= 2, s"factor must be >= 2, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val scaled: Map[String, Seq[String]] = Map(
        "documents" -> Seq("doc_id"),
        "embeddings" -> Seq("vec_id"),
        "events" -> Seq("event_id"))
      for ((t, ids) <- scaled) {
        val df = spark.read.parquet(s"$src/$t.parquet")
        // size output files with the data: ~factor x source partitions
        val parts = math.max(spark.sparkContext.defaultParallelism,
          df.rdd.getNumPartitions * math.min(factor, 8))
        replicate(df, factor, ids)
          .repartition(parts)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
        println(s"[scalegen] $t x$factor -> $out/$t.parquet")
      }
      val shared = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")
      for (t <- shared) {
        val p = new java.io.File(s"$src/$t.parquet")
        if (p.exists()) {
          spark.read.parquet(p.toString)
            .write.mode("overwrite").parquet(s"$out/$t.parquet")
          println(s"[scalegen] $t copied")
        }
      }
    } finally spark.stop()
  }
}
