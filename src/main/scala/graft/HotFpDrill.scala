package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hostile hot-fingerprint ladder for the round-20 dedup plan change:
  * the first-occurrence keeper moved from `row_number() OVER
  * (PARTITION BY fp)` to `groupBy(fp).agg(min(...))` + join-back in
  * [[graft.operators.Dedup.exactDups]],
  * [[graft.operators.Dedup.exactDupsIncremental]] and
  * [[graft.operators.Cleaning.paragraphDedup]]. The uniform ladders
  * cannot see why: with every fingerprint at small multiplicity the
  * window and the aggregate cost the same. This drill builds the
  * corpus the operators exist for — ONE boilerplate paragraph planted
  * twice in every four-paragraph document, so a single fingerprint
  * owns 50% of all paragraphs corpus-wide (the CCNet cookie-banner
  * case), and a document-level twin where one text owns 50% of all
  * docs — and times the shipped aggregate form against an inline
  * replica of the replaced window form at ×1/×10/×100.
  *
  * Expected shape: the window form's hot key serializes through one
  * task (its sort is single-threaded in the O(hot) partition, and AQE
  * skew splitting does not apply to window partitions), so its decade
  * slope degrades toward linear-in-one-task; the aggregate form
  * partial-combines the hot key to one row per mapper and its join
  * back is AQE-skew-splittable, so it keeps the distributed slope.
  *
  * `HOTFP_DOCS` overrides the base doc count (default 20 000).
  */
object HotFpDrill {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("HOTFP_DOCS", "20000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Cleaning, Dedup, TextAnalysis}

    val boiler = "Share and subscribe today. Cookie consent applies to " +
      "this site and every visit you make here."
    def paraCorpus(n: Long): DataFrame = {
      val id = col("id").cast("string")
      spark.range(n).select(col("id").as("doc_id"), concat(
        lit("Unique opening paragraph for document "), id,
        lit(" with enough words to look like prose.\n\n"), lit(boiler),
        lit("\n\nDistinct body paragraph "), id,
        lit(" carrying the actual content of the page.\n\n"), lit(boiler))
        .as("text"))
    }
    // 50% of DOCS share one text: the document-level hot fp
    def docCorpus(n: Long): DataFrame =
      spark.range(n).select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, lit(boiler))
          .otherwise(concat(lit("unique document "), col("id").cast("string")))
          .as("text"))

    // the REPLACED window form of paragraphDedup, kept verbatim for the
    // before/after row (same output, degenerate plan on this corpus)
    def paragraphDedupWindow(docs: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"), col("pos"))
      val paras = docs.select(col("doc_id"),
          posexplode(split(col("text"), "\n\\s*\n")).as(Seq("pos", "para")))
        .filter(trim(col("para")) =!= "")
        .withColumn("fp", TextAnalysis.fingerprint(col("para")))
      val ranked = paras.withColumn("_rk", row_number().over(w))
      val agged = ranked.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_paras"),
          sum(when(col("_rk") > 1, 1L).otherwise(0L)).as("n_removed"),
          array_join(transform(
            array_sort(collect_list(when(col("_rk") === 1,
              struct(col("pos"), col("para"))))),
            x => x.getField("para")), "\n\n").as("clean_text"))
      docs.select(col("doc_id")).join(agged, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_paras"), lit(0L)).as("n_paras"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
    }
    def exactDupsWindow(docs: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"))
      docs.withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("dup_rank", row_number().over(w))
        .withColumn("is_duplicate", col("dup_rank") > 1)
        .select(col("doc_id"), col("fp"), col("dup_rank"), col("is_duplicate"))
    }

    // wall time AND the longest single task of the run — the straggler
    // is the 100 TB signal: a hot window partition is ONE task whose
    // duration grows linearly with the hot key while every other core
    // idles, so maxTask/wall → 1 is the degenerate shape even when the
    // small-cluster wall clock still looks fine
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(ev: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (ev.taskInfo != null) {
          val d = ev.taskInfo.duration
          var cur = maxTask.get()
          while (d > cur && !maxTask.compareAndSet(cur, d)) cur = maxTask.get()
        }
    })
    def time(f: => DataFrame): (Double, Double) = (1 to 2).map { _ =>
      maxTask.set(0L)
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      ((System.nanoTime() - t0) / 1e9, maxTask.get() / 1e3)
    }.minBy(_._1)

    val mults = sys.env.getOrElse("HOTFP_MULTS", "1,10,100")
      .split(",").map(_.trim.toLong).toSeq
    for (mult <- mults) {
      val n = base * mult
      val paras = paraCorpus(n).localCheckpoint()
      val docs = docCorpus(n).localCheckpoint()
      val (pAgg, pAggT) = time(Cleaning.paragraphDedup(paras))
      val (pWin, pWinT) = time(paragraphDedupWindow(paras))
      val (dAgg, dAggT) = time(Dedup.exactDups(docs))
      val (dWin, dWinT) = time(exactDupsWindow(docs))
      println(f"HOTFP x$mult%-4d docs=$n%-8d paragraph_dedup " +
        f"agg=$pAgg%.2fs(maxTask=$pAggT%.2f) window=$pWin%.2fs(maxTask=$pWinT%.2f) | " +
        f"dedup_exact agg=$dAgg%.2fs(maxTask=$dAggT%.2f) " +
        f"window=$dWin%.2fs(maxTask=$dWinT%.2f)")
    }
    spark.stop()
  }
}
