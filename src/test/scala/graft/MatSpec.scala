package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, Mat}

/** The materialization seam ([[graft.operators.Mat]]): every mode must
  * produce the same rows — the seam changes WHERE an intermediate
  * lands (executor-local blocks now vs reliable storage later vs no
  * standalone head job), never WHAT flows through it. The `reliable:`
  * path is the cluster-scale setting the r20 verdict asked for
  * (localCheckpoint's lineage-truncated executor-local blocks are a
  * late-job single-executor-loss failure at 100 TB). */
class MatSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta\n\nshared promo line\n\ngamma delta"),
    (2L, "epsilon zeta\n\nshared promo line"),
    (3L, "alpha beta\n\nshared promo line\n\neta theta")).toDF("doc_id", "text")

  private def run(mode: String): Seq[(Long, Long, Long, String)] = {
    val prev = spark.conf.getOption(Mat.ModeKey)
    spark.conf.set(Mat.ModeKey, mode)
    try Cleaning.paragraphDedup(docs)
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    finally prev match {
      case Some(v) => spark.conf.set(Mat.ModeKey, v)
      case None => spark.conf.unset(Mat.ModeKey)
    }
  }

  test("eager, lazy and reliable modes produce identical rows") {
    val work = java.nio.file.Files.createTempDirectory("graft-mat").toString
    val base = run("lazy")
    assert(base.nonEmpty)
    assert(run("eager") === base)
    assert(run(s"reliable:$work") === base)
    // the reliable path really landed the intermediate on storage
    val staged = new java.io.File(work).listFiles()
    assert(staged != null && staged.nonEmpty,
      "reliable mode must write the materialized frame under its dir")
  }

  test("unknown modes fall back to lazy (no standalone head job)") {
    assert(run("lazy") === run("definitely-not-a-mode"))
  }
}
