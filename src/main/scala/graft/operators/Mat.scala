package graft.operators

import org.apache.spark.sql.DataFrame

/** The materialization seam (r21): every operator that must pin a
  * multiply-consumed intermediate calls [[point]] instead of hardcoding
  * `localCheckpoint()`. Why a seam: `localCheckpoint` truncates lineage
  * onto executor-local blocks — measured right for the local bench
  * (AQE-degenerate doubled branches without it), but NOT fault-tolerant:
  * at 100 TB one lost executor late in a job kills the run, so a
  * cluster deployment lands these frames on reliable storage instead.
  * The mode is a session conf, not a code fork:
  *
  *  - `eager` — `localCheckpoint()` (materialize NOW as a head job);
  *  - `lazy`  — `localCheckpoint(eager = false)` (materialize inside
  *    whichever consumer job runs first — no standalone barrier; the
  *    golden_e2e r20 fix generalized);
  *  - `reliable:<dir>` — write parquet under `<dir>/<uuid>` and read it
  *    back: survives executor loss, shareable across jobs — the
  *    cluster-scale setting (the "natural persist point" comments in
  *    paragraphDedup/duplicatedSpans cash out here).
  *
  * Default is `lazy`: measured on the r21 interleaved A/B drill
  * ([[graft.MatDrill]]) across the curation/dedup/golden chains — the
  * eager head job serializes work the first consumer overlaps.
  */
object Mat {
  val ModeKey = "spark.graft.materialize.mode"

  def point(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ModeKey, "lazy") match {
      case "eager" => df.localCheckpoint()
      // `none` = passthrough (no materialization at all) — the
      // measurement control [[graft.MatDrill]] uses to price a site's
      // repeated-subtree cost inside one JVM; never a production mode
      // (multi-consumer sites re-run their upstream pass per consumer)
      case "none" => df
      case m if m.startsWith("reliable:") =>
        val dir = m.stripPrefix("reliable:") + "/" +
          java.util.UUID.randomUUID().toString
        df.write.mode("overwrite").parquet(dir)
        df.sparkSession.read.parquet(dir)
      case _ => df.localCheckpoint(eager = false)
    }
}
