package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM / codegen / parquet-reader paths once so the first
    // measured query doesn't absorb seconds of one-time initialization.
    // Cover each physical-operator family the queries use (scan+agg,
    // broadcast join, window rank, generator) — warmup on one shape
    // leaves the first query of every OTHER shape paying its own
    // class-loading/codegen bill, which lands on an arbitrary map-order
    // query and shows up as phantom per-query noise.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      // separate try per shape: one failing warmup must not silently
      // skip the rest (a swallowed exception here showed up as phantom
      // first-query cost in BENCH once already)
      def warm(f: => Any): Unit = try { f } catch { case _: Throwable => () }
      warm(spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("count(distinct lower(text))").collect())
      val tiny = Seq((1L, "a b"), (2L, "c d")).toDF("id", "t")
      val dim = tiny.select(col("id").as("id2"), col("t").as("t2"))
      warm(tiny.join(broadcast(dim), $"id" === $"id2")
        .withColumn("w", explode(split(col("t"), " ")))
        .withColumn("r", row_number().over(Window.partitionBy("id").orderBy("w")))
        .filter($"r" <= 1).count())
      warm(tiny.localCheckpoint().count()) // checkpoint block-manager machinery
    }
    // Calibration: one fixed-shape scan+agg (the warmup scan, measured
    // like a real query — min-of-2, noop sink). Its cost depends only
    // on SF and machine state, so a contended bench window inflates it
    // exactly the way it inflates the real queries; comparing this ONE
    // field across runs machine-detects a bad window (rounds 12-14 each
    // needed per-query archaeology to adjudicate 1.4-2x contended
    // totals). Read: calibration ~equal across two runs => totals are
    // comparable; calibration inflated 2x => the whole run is, too.
    val calibration = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      try spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("count(distinct lower(text)) AS n")
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }.min
    // Min of two back-to-back runs per query: the r7 driver bench was
    // distorted ~1.5-6x by transient machine contention (verified by
    // warm local replay of identical code); a single sample cannot tell
    // a regression from a noisy neighbor, while the min of two is robust
    // to a one-off spike and still reflects steady-state cost. The min
    // is over SUCCESSFUL runs only — a fast failure must not masquerade
    // as the query's best time; if every run fails, report the slowest
    // failing duration (never a phantom speedup) and say so on stderr.
    //
    // The measured action is a NOOP-sink write, not count(): under
    // count() Catalyst column-prunes the whole projection away for
    // projection-only queries (redact_pii, rolling_fp, e4_l2norm, ...),
    // so their "time" was a zero-column row-count scan and a 100x
    // regression in the projected expressions would never reach the
    // BENCH total. The noop sink materializes every output column and
    // discards it — the real work, no I/O noise. (Totals from rounds
    // <= 9 undercount those queries; the spread is small because the
    // affected queries are the cheap tail.)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true
        } catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val good = times.collect { case (t, true) => t }
      if (good.isEmpty) System.err.println(s"[bench] $name FAILED every run")
      name -> (if (good.nonEmpty) good.min else times.map(_._1).max)
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // END-of-run calibration: the start probe certifies the window was
    // quiet when the bench BEGAN, not throughout — round 15's driver run
    // carried cal 0.306 yet two adjacent mid-list queries (bench order
    // 48-49) ran 3.5x their stable four-round anchor cost, a mid-run
    // contention spike the single probe could not see. Same probe, same
    // min-of-2; read: start≈end≈anchor ⇒ whole run comparable; end
    // inflated ⇒ late queries suspect; BOTH low but a query 3x its
    // neighbor-round cost ⇒ a spike BETWEEN the probes, rerun before
    // believing it.
    val calibrationEnd = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      try spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("count(distinct lower(text)) AS n")
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }.min
    // The harness that reads this line keeps only the LAST ~2000 chars of
    // output and parses the JSON line found there; the sbt "[success] ..."
    // line printed after main() returns eats ~70 of those. So the line must
    // stay under a hard byte budget or its head gets truncated away and
    // parsing fails (round 3 lost its perf grade exactly this way, at 83
    // full-precision query entries). total stays exact over ALL queries;
    // per-query entries are 3-decimal, slowest-first, and cut off at the
    // budget — the dropped tail is the fastest (least informative) queries.
    val budget = 1700
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // JSON-escape interpolated strings (sfDir is environment-controlled:
    // a quote or backslash in the path must not forfeit the perf grade
    // on a parse error)
    def jq(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val entries = results.toSeq.sortBy(-_._2)
      .map { case (k, v) => "\"" + jq(k) + "\":" + fmt(v) }
    val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"calibration":${fmt(calibration)},"calibration_end":${fmt(calibrationEnd)},"queries":{"""
    val tail2 = s"""},"sf":"${jq(sfDir)}"}"""
    val fixed = head.length + tail2.length
    val kept = new StringBuilder
    var n = 0
    // STOP at the first entry that doesn't fit (no greedy skip): entries
    // are slowest-first, so cutting here is what keeps the documented
    // invariant that the dropped tail is the fastest queries — a greedy
    // fill would skip a slow long-named query yet keep fast short ones
    var full = false
    entries.foreach { e =>
      val add = e.length + (if (n > 0) 1 else 0)
      if (!full && fixed + kept.length + add <= budget) {
        if (n > 0) kept.append(','); kept.append(e); n += 1
      } else full = true
    }
    println(head + kept + tail2)
    spark.stop()
  }
}
