package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

import graft.io.IvfIndex
import graft.operators.Similarity

/** The persisted IVF index: build/probe must be byte-for-byte the same
  * ranking as the in-query ivfTopK, the vector table must land
  * cell-partitioned, and a probe must PRUNE the unprobed cells at the
  * scan (the whole point of persisting the assignment). */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  /** The probe-result comparison key: (q_vec_id, vec_id, score, rank).
    * One definition for every test — a probe schema change is a
    * one-line edit, not fifteen. */
  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("persisted probe equals in-query ivfTopK row for row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val cands = vecs(300, 16, seed = 5)
    val qs = vecs(4, 16, seed = 99)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    IvfIndex.build(cands, dir, nlist = 8)
    val persisted = rows(IvfIndex.probe(spark, dir, qs, k = 10, nprobe = 3))
    val inQuery = rows(Similarity.ivfTopK(qs, cands, k = 10, nlist = 8, nprobe = 3))
    assert(persisted == inQuery)
    assert(persisted.nonEmpty)
    // rebuild over the same vectors: same index, same answers (S13
    // overwrite semantics)
    IvfIndex.build(cands, dir, nlist = 8)
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 10, nprobe = 3)) == inQuery)
  }

  test("append assigns against the STORED centroids and a stream keeps the index current") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val base = vecs(150, 16, seed = 3)
    val late = vecs(80, 16, seed = 31).withColumn("vec_id", col("vec_id") + 1000L)
    IvfIndex.build(base, dir, nlist = 6)
    val storedCents = IvfIndex.centroids(spark, dir)
    // feed the late vectors through a real micro-batch stream into the
    // foreachBatch append sink
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = input.toDF()
      .selectExpr("_1 AS vec_id", "CAST(_2 AS ARRAY<FLOAT>) AS embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        IvfIndex.append(batch, dir, batchId = Some(id))
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ivf-ck").toString)
      .start()
    try {
      input.addData(late.collect().toSeq.map(r => (r.getLong(0), r.getSeq[Float](1))))
      q.processAllAvailable()
    } finally q.stop()
    // probing the appended index == probeScore over base+late with the
    // BASE-derived centroids (append must NOT re-train)
    val qs = vecs(3, 16, seed = 77)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val expected = rows(Similarity.probeScore(qs,
      Similarity.assignCells(base.unionByName(late), storedCents, "embedding"),
      storedCents, k = 8, nprobe = 3, "q_vec_id", "q_embedding", "vec_id", "embedding"))
    val got = rows(IvfIndex.probe(spark, dir, qs, k = 8, nprobe = 3))
    assert(got == expected)
    // the appended ids are actually reachable
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 6))
      .exists(_._2 >= 1000L))
  }

  test("a replayed foreachBatch append is a no-op — no duplicate probe rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(vecs(150, 16, seed = 9), dir, nlist = 6)
    val late = vecs(60, 16, seed = 91).withColumn("vec_id", col("vec_id") + 2000L)
    val qs = vecs(3, 16, seed = 47)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    IvfIndex.append(late, dir, batchId = Some(7L))
    val once = IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(once.exists(_._2 >= 2000L), "the appended batch must be reachable")
    // at-least-once retry: the SAME batch id replays (the sink already
    // committed, the stream's checkpoint didn't) — must be a no-op
    IvfIndex.append(late, dir, batchId = Some(7L))
    val twice = IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(twice.toSeq.sorted == once.toSeq.sorted,
      "a replayed batch must not change probe results")
    val pairs = twice.map(r => (r._1, r._2))
    assert(pairs.distinct.length == pairs.length,
      s"duplicate (query, vec_id) rows after replay")
    // a retry over a CRASHED attempt (orphan per-attempt staging, no
    // commit) lands exactly once and sweeps the orphan
    val staging = new java.io.File(s"$dir/appends_staging/8_deadbeef")
    staging.mkdirs()
    new java.io.File(staging, "partial.parquet").createNewFile()
    IvfIndex.append(late.withColumn("vec_id", col("vec_id") + 1000L), dir, batchId = Some(8L))
    val after = IvfIndex.probe(spark, dir, qs, k = 300, nprobe = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(after.exists(_._2 >= 3000L) && after.distinct.length == after.length)
    assert(!staging.exists(), "crashed attempt's staging must be swept after commit")
  }

  test("an EMPTY committed batch does not break the probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(vecs(100, 16, seed = 17), dir, nlist = 4)
    val qs = vecs(2, 16, seed = 61)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 5, nprobe = 4))
    // an empty micro-batch (routine after recovery / AvailableNow):
    // publishes a batch dir with no data files — the probe must still
    // serve the base index, not die on schema inference
    IvfIndex.append(vecs(100, 16, seed = 17).limit(0), dir, batchId = Some(0L))
    assert(new java.io.File(s"$dir/appends/batch=0").exists())
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 5, nprobe = 4)) == before)
    // empty batch dirs are foldable cleanup: a forced fold retires the
    // dir into the manifest, and a replay still no-ops
    IvfIndex.compact(spark, dir, foldMinRatio = 0.0)
    assert(!new java.io.File(s"$dir/appends/batch=0").exists(),
      "a forced fold must retire even an empty batch dir")
    IvfIndex.append(vecs(100, 16, seed = 17).limit(0), dir, batchId = Some(0L))
    assert(!new java.io.File(s"$dir/appends/batch=0").exists(),
      "a replayed folded-empty batch must not re-publish")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 5, nprobe = 4)) == before)
  }

  test("compact folds committed appends into vectors/ and the manifest keeps replays no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(vecs(120, 16, seed = 19), dir, nlist = 4)
    val late = vecs(50, 16, seed = 191).withColumn("vec_id", col("vec_id") + 5000L)
    IvfIndex.append(late, dir, batchId = Some(3L))
    val qs = vecs(3, 16, seed = 71)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4))
    assert(before.exists(_._2 >= 5000L), "appended rows reachable before the fold")
    IvfIndex.compact(spark, dir)
    // answers unchanged; the appended rows now live in vectors/, the
    // batch dir is GONE, and the manifest records the folded id
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4)) == before)
    assert(!new java.io.File(s"$dir/appends/batch=3").exists(),
      "fold must remove the folded batch dir")
    assert(new java.io.File(s"$dir/appends_folded").exists(),
      "fold must write the folded-batch manifest")
    // a post-compact replay of the folded batch is STILL a no-op
    IvfIndex.append(late, dir, batchId = Some(3L))
    val after = IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(after.distinct.length == after.length,
      "replaying a folded batch must not duplicate rows")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4)) == before)
  }

  test("a zombie re-publish of a folded batch is pruned by probe and healed by the next fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(vecs(120, 16, seed = 23), dir, nlist = 4)
    val late = vecs(40, 16, seed = 231).withColumn("vec_id", col("vec_id") + 7000L)
    IvfIndex.append(late, dir, batchId = Some(9L))
    val qs = vecs(3, 16, seed = 72)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    IvfIndex.compact(spark, dir, foldMinRatio = 0.0) // fold batch 9 into vectors/
    val folded = rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4))
    // simulate the zombie: an attempt that passed the pre-check before
    // the fold, stalled, and published its staging AFTER the fold moved
    // the rows — the dir reappears although the manifest lists batch=9
    spark.read.parquet(s"$dir/vectors")
      .filter(col("vec_id") >= 7000L)
      .write.partitionBy("cell").parquet(s"$dir/appends/batch=9")
    // probe must PRUNE the stale dir — same answers, no duplicates
    val seen = IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(seen.distinct.length == seen.length, "stale re-publish must not duplicate")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4)) == folded)
    // the next fold deletes the stale dir instead of unioning it again
    IvfIndex.compact(spark, dir, foldMinRatio = 0.0)
    assert(!new java.io.File(s"$dir/appends/batch=9").exists(),
      "fold must delete a stale re-published batch dir")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4)) == folded)
  }

  test("compact collapses per-cell small files, preserves layout and answers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val base = vecs(120, 16, seed = 13)
    IvfIndex.build(base, dir, nlist = 4)
    // several appends -> several files per touched cell
    for (s <- 1 to 3)
      IvfIndex.append(vecs(40, 16, seed = 100 + s)
        .withColumn("vec_id", col("vec_id") + s * 1000L), dir)
    def parquetFiles() = {
      val root = new java.io.File(s"$dir/vectors")
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val qs = vecs(3, 16, seed = 55)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 10, nprobe = 4))
    val filesBefore = parquetFiles()
    assert(filesBefore.values.max > 1, s"appends should accrete files: $filesBefore")
    val total = IvfIndex.compact(spark, dir)
    val filesAfter = parquetFiles()
    assert(filesAfter.keySet == filesBefore.keySet, "partition layout must survive")
    assert(filesAfter.values.forall(_ == 1), s"expected 1 file per cell: $filesAfter")
    assert(total == filesAfter.values.sum)
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 10, nprobe = 4)) == before)
  }

  test("a crash between compact's swap renames is recovered; work area stays outside vectors/") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(vecs(120, 16, seed = 23), dir, nlist = 4)
    val qs = vecs(3, 16, seed = 66)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 10, nprobe = 4))
    // simulate the worst crash point of a per-leaf compact: tmp fully
    // written in the work area, dst already renamed to bak, process dies
    // before tmp -> dst (the leaf is GONE from vectors/)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val leaf = new java.io.File(s"$dir/vectors").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).head.getName
    val leafPath = new org.apache.hadoop.fs.Path(s"$dir/vectors/$leaf")
    spark.read.parquet(leafPath.toString).repartition(1)
      .write.parquet(s"$dir/compact_work/${leaf}_compact_tmp")
    assert(fs.rename(leafPath,
      new org.apache.hadoop.fs.Path(s"$dir/compact_work/${leaf}_compact_bak")))
    // NO stray partition dirs pollute the root while crashed: the swap
    // siblings are in compact_work, not vectors/
    val strays = new java.io.File(s"$dir/vectors").listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.matches("cell=\\d+"))
    assert(strays.isEmpty, s"partition root polluted: ${strays.mkString(",")}")
    // next compact recovers the interrupted swap first, then compacts
    IvfIndex.compact(spark, dir)
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 10, nprobe = 4)) == before)
    assert(!new java.io.File(s"$dir/compact_work").exists())
  }

  test("the fold is amortized: tiny appends stay put until the ratio (or 0.0) says fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(vecs(400, 16, seed = 59), dir, nlist = 4)
    // 3 vectors against 400: far under the default 10% volume threshold
    IvfIndex.append(vecs(3, 16, seed = 591).withColumn("vec_id", col("vec_id") + 8000L),
      dir, batchId = Some(1L))
    val qs = vecs(2, 16, seed = 87)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    def batchFiles() = {
      val d = new java.io.File(s"$dir/appends/batch=1")
      if (!d.exists()) -1
      else {
        def walk(f: java.io.File): Int =
          if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
          else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
        walk(d)
      }
    }
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 500, nprobe = 4))
    assert(before.exists(_._2 >= 8000L))
    assert(batchFiles() > 0)
    IvfIndex.compact(spark, dir) // default ratio: fold NOT due
    assert(batchFiles() > 0, "a below-threshold batch must stay in appends/")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 500, nprobe = 4)) == before)
    IvfIndex.compact(spark, dir, foldMinRatio = 0.0) // forced fold
    assert(batchFiles() == -1, "a forced fold must remove the batch dir (manifest remembers)")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 500, nprobe = 4)) == before)
  }

  test("the batch-COUNT trigger folds tiny batches the byte ratio would never reach") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(vecs(400, 16, seed = 67), dir, nlist = 4)
    for (b <- 1 to 3)
      IvfIndex.append(vecs(2, 16, seed = 670 + b)
        .withColumn("vec_id", col("vec_id") + b * 10000L), dir, batchId = Some(b.toLong))
    val qs = vecs(2, 16, seed = 89)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 500, nprobe = 4))
    // an impossible byte ratio isolates the COUNT branch: only
    // 3 data-bearing batches >= foldMaxBatches=3 can trip this fold
    IvfIndex.compact(spark, dir, foldMinRatio = 1000.0, foldMaxBatches = 3)
    for (b <- 1 to 3)
      assert(!new java.io.File(s"$dir/appends/batch=$b").exists(),
        s"batch $b should be folded away")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 500, nprobe = 4)) == before)
    // folded batches do NOT latch the trigger: one tiny new batch must
    // NOT re-trip the count branch on its own
    IvfIndex.append(vecs(2, 16, seed = 679).withColumn("vec_id", col("vec_id") + 50000L),
      dir, batchId = Some(9L))
    IvfIndex.compact(spark, dir, foldMinRatio = 1000.0, foldMaxBatches = 3)
    assert(new java.io.File(s"$dir/appends/batch=9").listFiles().nonEmpty,
      "already-folded batches must not count toward foldMaxBatches")
    // and a replay of a long-folded batch still no-ops via the manifest
    IvfIndex.append(vecs(2, 16, seed = 671).withColumn("vec_id", col("vec_id") + 10000L),
      dir, batchId = Some(1L))
    assert(!new java.io.File(s"$dir/appends/batch=1").exists(),
      "a replayed folded batch must not re-publish")
  }

  test("compact sweeps a dead publish-race loser's staging nested inside a batch dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    // big base + tiny batch keeps the fold below threshold: the WALK
    // sweep (not the fold's dir removal) must clear the orphan
    IvfIndex.build(vecs(400, 16, seed = 79), dir, nlist = 4)
    IvfIndex.append(vecs(2, 16, seed = 791).withColumn("vec_id", col("vec_id") + 3000L),
      dir, batchId = Some(5L))
    val qs = vecs(2, 16, seed = 93)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 500, nprobe = 4))
    // HDFS rename-onto-existing nests a losing attempt's staging inside
    // the committed dir; if that attempt dies pre-sweep the orphan wedges
    // partition discovery on every later appends read — compact must heal
    val orphan = new java.io.File(s"$dir/appends/batch=5/5_deadbeef/cell=0")
    orphan.mkdirs()
    new java.io.File(orphan, "part-orphan.parquet").createNewFile()
    IvfIndex.compact(spark, dir)
    assert(!new java.io.File(s"$dir/appends/batch=5/5_deadbeef").exists(),
      "the nested orphan must be swept")
    assert(new java.io.File(s"$dir/appends/batch=5").exists(),
      "the un-folded batch itself must survive the sweep")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 500, nprobe = 4)) == before)
  }

  test("compact recovers a crashed leaf swap BEFORE folding appends — no row lost") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(vecs(120, 16, seed = 37), dir, nlist = 4)
    IvfIndex.append(vecs(40, 16, seed = 371).withColumn("vec_id", col("vec_id") + 7000L),
      dir, batchId = Some(1L))
    val qs = vecs(3, 16, seed = 73)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4))
    // crash a leaf swap: the leaf lives only in compact_work's bak while
    // committed appends are ALSO pending — the dangerous combination:
    // folding first would rewrite the index without the leaf's rows
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val leaf = new java.io.File(s"$dir/vectors").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).head.getName
    spark.read.parquet(s"$dir/vectors/$leaf").repartition(1)
      .write.parquet(s"$dir/compact_work/${leaf}_compact_tmp")
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/vectors/$leaf"),
      new org.apache.hadoop.fs.Path(s"$dir/compact_work/${leaf}_compact_bak")))
    IvfIndex.compact(spark, dir)
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4)) == before,
      "recovery must restore the crashed leaf before the fold rewrites the index")
  }

  test("a PROBE heals a crashed leaf swap — no silently missing cell on the read path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(vecs(120, 16, seed = 41), dir, nlist = 4)
    val qs = vecs(3, 16, seed = 74)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4))
    // crash a leaf swap with NO compact to clean it up: the cell exists
    // only in compact_work, the index dir looks healthy — a probe that
    // doesn't heal would silently drop every vector in that cell forever
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val leaf = new java.io.File(s"$dir/vectors").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).head.getName
    spark.read.parquet(s"$dir/vectors/$leaf").repartition(1)
      .write.parquet(s"$dir/compact_work/${leaf}_compact_tmp")
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/vectors/$leaf"),
      new org.apache.hadoop.fs.Path(s"$dir/compact_work/${leaf}_compact_bak")))
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4)) == before,
      "the read path must restore the crashed leaf, not serve a partial index")
    assert(!new java.io.File(s"$dir/compact_work").exists(),
      "the healed work area must be cleaned up")
  }

  test("the folded-batch manifest is bounded by the retention window") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(vecs(80, 16, seed = 53), dir, nlist = 4)
    // fold two early batches, then — far beyond the retention window —
    // a late one; the early entries must be pruned from the manifest
    for (b <- Seq(1L, 2L)) IvfIndex.append(
      vecs(5, 16, seed = 500 + b.toInt).withColumn("vec_id", col("vec_id") + b * 1000L),
      dir, batchId = Some(b))
    IvfIndex.compact(spark, dir, foldMinRatio = 0.0, manifestRetain = 10L)
    IvfIndex.append(vecs(5, 16, seed = 531).withColumn("vec_id", col("vec_id") + 90000L),
      dir, batchId = Some(5000L))
    IvfIndex.compact(spark, dir, foldMinRatio = 0.0, manifestRetain = 10L)
    val manifest = scala.io.Source.fromFile(s"$dir/appends_folded").getLines().toSet
    assert(manifest == Set("watermark=4989", "batch=5000"),
      s"entries older than retain must be pruned and the eviction cutoff " +
        s"persisted as the watermark line, got $manifest")
    // a replay WITHIN the window still no-ops
    IvfIndex.append(vecs(5, 16, seed = 531).withColumn("vec_id", col("vec_id") + 90000L),
      dir, batchId = Some(5000L))
    assert(!new java.io.File(s"$dir/appends/batch=5000").exists(),
      "an in-window replay must no-op against the manifest")
    // a replay BELOW the retention cutoff — its own manifest line is
    // gone — must no-op against the persisted watermark, not silently
    // duplicate its rows into vectors/ (the hole retention would
    // otherwise reopen)
    val qs = vecs(2, 16, seed = 99)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 1000, nprobe = 4))
    IvfIndex.append(
      vecs(5, 16, seed = 501).withColumn("vec_id", col("vec_id") + 1000L),
      dir, batchId = Some(1L))
    assert(!new java.io.File(s"$dir/appends/batch=1").exists(),
      "an evicted-id replay must no-op against the watermark")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 1000, nprobe = 4)) == before,
      "an evicted-id replay must not change the index contents")
    // and the next fold treats a zombie-published evicted-id dir as
    // stale: force one past the pre-check by planting the dir directly
    val zombie = new java.io.File(s"$dir/appends/batch=2/cell=0")
    zombie.mkdirs()
    IvfIndex.compact(spark, dir, foldMinRatio = 0.0, manifestRetain = 10L)
    assert(!new java.io.File(s"$dir/appends/batch=2").exists(),
      "the fold must delete (not re-fold) a below-watermark batch dir")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 1000, nprobe = 4)) == before,
      "a below-watermark zombie dir must not be folded into the base tree")
  }

  test("compact folds through a stale _build_bak left by a crash after promote") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    IvfIndex.build(vecs(100, 16, seed = 43), dir, nlist = 4)
    IvfIndex.append(vecs(30, 16, seed = 431).withColumn("vec_id", col("vec_id") + 9000L),
      dir, batchId = Some(1L))
    // a previous build/fold died between swapInto's promote and its bak
    // delete: healthy index, lingering bak — the fold's own swap must
    // clear it (build's recoverSwap discipline), not fail forever
    new java.io.File(dir + "_build_bak/stale").mkdirs()
    val qs = vecs(2, 16, seed = 83)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4))
    IvfIndex.compact(spark, dir)
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4)) == before)
    assert(!new java.io.File(dir + "_build_bak").exists())
  }

  test("a batch replay over a crashed index swap heals first, then no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    IvfIndex.build(vecs(100, 16, seed = 53), dir, nlist = 4)
    val late = vecs(30, 16, seed = 531).withColumn("vec_id", col("vec_id") + 4000L)
    IvfIndex.append(late, dir, batchId = Some(2L))
    val qs = vecs(2, 16, seed = 85)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4))
    // crash the swap right after dst -> bak: the index dir is missing,
    // so the committed-marker check alone would wrongly re-stage the
    // replayed batch into a healed-mid-write index
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "_build_bak")))
    IvfIndex.append(late, dir, batchId = Some(2L)) // foreachBatch retry
    val after = IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(after.distinct.length == after.length, "replay must not duplicate rows")
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 200, nprobe = 4)) == before)
  }

  test("readers leave an in-flight rebuild's staging alone; only a missing index recovers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    IvfIndex.build(vecs(80, 16, seed = 41), dir, nlist = 4)
    // simulate another process mid-rebuild: staging exists NEXT TO a
    // consistent index — a read must not delete it (the old
    // unconditional recovery did, killing the concurrent build)
    val staging = new java.io.File(dir + "_build_tmp/centroids")
    staging.mkdirs()
    val marker = new java.io.File(staging, "in-flight.parquet")
    marker.createNewFile()
    val cents = IvfIndex.centroids(spark, dir)
    assert(cents.size == 4)
    assert(marker.exists(), "reader deleted an in-flight build's staging")
    // the single writer cleans it up on its next build, and still works
    IvfIndex.build(vecs(80, 16, seed = 41), dir, nlist = 4)
    assert(!marker.exists())
    assert(IvfIndex.centroids(spark, dir).size == 4)
  }

  test("a crash between build's swap renames is rolled back at the next read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    IvfIndex.build(vecs(100, 16, seed = 29), dir, nlist = 4)
    val qs = vecs(2, 16, seed = 88)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val before = rows(IvfIndex.probe(spark, dir, qs, k = 5, nprobe = 4))
    // simulate a rebuild dying right after dst -> bak (no tmp yet
    // swapped in): the index dir is gone, only the bak survives
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "_build_bak")))
    // the next read entry point rolls the previous index back
    assert(rows(IvfIndex.probe(spark, dir, qs, k = 5, nprobe = 4)) == before)
    assert(!new java.io.File(dir + "_build_bak").exists())
  }

  test("the vector table is hive-partitioned by cell and probes prune it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val cands = vecs(300, 16, seed = 7)
    val qs = vecs(2, 16, seed = 42)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    IvfIndex.build(cands, dir, nlist = 8)
    val cellDirs = new java.io.File(s"$dir/vectors").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(cellDirs.length > 1, s"expected multiple cell partitions, saw ${cellDirs.mkString(",")}")
    // the probe plan must carry a dynamic partition-pruning filter on
    // the cell scan — unprobed directories are never read
    val plan = IvfIndex.probe(spark, dir, qs, k = 5, nprobe = 2)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("dynamicpruning"),
      s"probe scan is not partition-pruned:\n$plan")
    // ...and pruning must SURVIVE the appends union: with a committed
    // batch present the probe reads base ∪ appends, and the base scan —
    // the 100 TB side — must still be dynamically pruned
    IvfIndex.append(vecs(40, 16, seed = 75).withColumn("vec_id", col("vec_id") + 6000L),
      dir, batchId = Some(1L))
    val unionPlan = IvfIndex.probe(spark, dir, qs, k = 5, nprobe = 2)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val dppScans = "dynamicpruningexpression".r.findAllIn(unionPlan).length
    assert(dppScans >= 2,
      s"both sides of the union must stay partition-pruned (saw $dppScans):\n$unionPlan")
  }

  test("probe LISTS only the probed cell directories — planning-time prune " +
      "on top of the runtime DPP") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val cands = vecs(400, 16, seed = 11)
    val qs = vecs(2, 16, seed = 47)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    IvfIndex.build(cands, dir, nlist = 8)
    val allCells = new java.io.File(s"$dir/vectors").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell=")).toSet
    val probed = Similarity.probeCellIds(qs, IvfIndex.centroids(spark, dir),
      nprobe = 2, "q_vec_id", "q_embedding").map(c => s"cell=$c").toSet
    assert(probed.size < allCells.size,
      s"fixture must leave unprobed cells (probed $probed of $allCells)")
    val res = IvfIndex.probe(spark, dir, qs, k = 5, nprobe = 2)
    // the scan's file inventory must cover EXACTLY the probed cells —
    // an unprobed directory is never even listed
    val listedCells = res.inputFiles.flatMap(
      "cell=\\d+".r.findFirstIn(_)).toSet
    assert(listedCells == probed,
      s"listing prune read $listedCells, probe set is $probed")
    // and the prune changes nothing about the answer
    assert(rows(res) == rows(Similarity.ivfTopK(qs, cands, k = 5, nlist = 8, nprobe = 2)))
  }

  test("randomized commit/replay/compact schedules never lose or duplicate a row") {
    // the exactly-once state machine under adversarial schedules: fresh
    // batches commit in order, arbitrary earlier ids replay at any
    // point (foreachBatch retries, zombie drivers), and compacts with a
    // TINY manifest retention fold + evict aggressively — so replays
    // routinely land below the retention cutoff and only the persisted
    // watermark stands between them and silent duplication. Invariant
    // at every compact point and at the end: the index holds exactly
    // the base vectors plus each committed batch's vectors, once.
    val rnd = new scala.util.Random(1107)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    IvfIndex.build(vecs(60, 16, seed = 61), dir, nlist = 4)
    val baseIds = spark.read.parquet(s"$dir/vectors")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def batchVecs(b: Long) = vecs(3, 16, seed = 6100 + b.toInt)
      .withColumn("vec_id", col("vec_id") + b * 100L + 10000L)
    var committed = List.empty[Long]
    var next = 0L
    def expectIds = baseIds ++ committed.flatMap(b => Seq(0L, 1L, 2L).map(_ + b * 100L + 10000L))
    def checkExact(): Unit = {
      val got = spark.read.parquet(s"$dir/vectors").select("vec_id")
        .collect().map(_.getLong(0)).toSeq
      assert(got.size == got.distinct.size,
        s"duplicated rows after schedule prefix (committed=$committed)")
      // vectors/ plus any still-unfolded committed appends is the full view
      val appends = new java.io.File(s"$dir/appends")
      val unfolded = Option(appends.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("batch=")).map(_.getName.stripPrefix("batch=").toLong)
      val appendIds = unfolded.flatMap(b =>
        Seq(0L, 1L, 2L).map(_ + b * 100L + 10000L)).toSet
      assert(got.toSet ++ appendIds == expectIds,
        s"lost rows: missing=${(expectIds -- got.toSet -- appendIds).take(5)} " +
          s"extra=${(got.toSet ++ appendIds -- expectIds).take(5)}")
    }
    for (_ <- 1 to 24) rnd.nextInt(3) match {
      case 0 => // fresh commit
        IvfIndex.append(batchVecs(next), dir, batchId = Some(next))
        committed ::= next; next += 1
      case 1 if committed.nonEmpty => // replay an arbitrary earlier id
        val b = committed(rnd.nextInt(committed.size))
        IvfIndex.append(batchVecs(b), dir, batchId = Some(b))
      case 2 => // fold + evict with a retention window of 2
        IvfIndex.compact(spark, dir, foldMinRatio = 0.0, manifestRetain = 2L)
        checkExact()
      case _ => ()
    }
    IvfIndex.compact(spark, dir, foldMinRatio = 0.0, manifestRetain = 2L)
    checkExact()
    assert(committed.size >= 5, "schedule must exercise real commits")
  }
}
