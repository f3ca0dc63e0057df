package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional file skipping (beyond-
  * reference tier; the OPTIMIZE-ZORDER idea from the lakehouse world).
  *
  * A 100 TB table is pruned through parquet row-group min/max stats: a
  * range filter skips a file only if the file's value interval misses
  * the predicate. Sorting by ONE key gives perfect intervals on that
  * key and full-width intervals on every other; interleaving the bits
  * of two keys (the Morton/Z curve) bounds BOTH dimensions per file, so
  * selective filters on either (or both) keys skip most files. The
  * whole operator is one range shuffle + in-partition sort — exactly
  * the cost of a plain sorted write.
  *
  * [[zValue]] is pure bit arithmetic on built-in expressions
  * (shift/and/or folds) — whole-stage codegen'd, no UDF.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * bucket ids: x occupies even bit positions, y odd. `bits` ≤ 31. */
  def zValue(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Proportional bucket id in [0, 1 << bits) for `v` over [lo, hi].
    * Scaled in double space: (v - lo) * n would overflow long for
    * nanosecond-epoch spans. hi - lo + 1 avoids div-by-zero on a
    * constant column and keeps hi itself inside the top bucket. */
  private def bucket(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    val n = (1L << bits).toDouble
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((v - lit(lo)).cast("double") * (n / (hi - lo + 1.0))).cast("long")))
  }

  /** Re-cluster `df` on the Z curve over two long-valued columns: scale
    * each to a `bits`-bit bucket by its observed min/max (one tiny
    * driver-side agg — four numbers, not data), then range-partition +
    * sort by the interleaved value. `numFiles` controls output
    * parallelism; each written file then covers a ~square rectangle of
    * the (cx, cy) space instead of a full-width stripe. */
  def zorderBy(df: DataFrame, cx: String, cy: String,
               bits: Int = 8, numFiles: Int = 8): DataFrame = {
    val r = df.agg(min(col(cx)), max(col(cx)), min(col(cy)), max(col(cy))).head()
    require(!r.anyNull, s"zorderBy: empty input or all-null $cx/$cy")
    val (lox, hix, loy, hiy) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val z = zValue(bucket(col(cx), lox, hix, bits), bucket(col(cy), loy, hiy, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Contiguous global row numbers `0..n-1` in `orderCol` order WITHOUT
    * the single-partition sort a naive `row_number() OVER (ORDER BY …)`
    * plans (one reducer holding the whole table — the classic 100 TB
    * cliff; `PlanPropertiesSpec` pins that no SinglePartition exchange
    * appears here). The distributed shape is core's `zipWithIndex`
    * re-expressed on DataFrames:
    *
    *  1. range-partition + in-partition sort on `orderCol`, pinned with
    *     `localCheckpoint` so the count job and the numbering job see
    *     the SAME partitioning (range boundaries come from sampling; at
    *     production scale this pin is the training-shard materialization
    *     you'd do anyway before stamping ids);
    *  2. per-partition counts — `numParts` longs to the driver, size
    *     independent of data — prefix-summed into offsets;
    *  3. one shuffle-free projection: `monotonically_increasing_id`'s
    *     documented layout (partition id ≪ 33 | per-partition counter
    *     in row order) yields the in-partition ordinal, plus the
    *     broadcast offset literal.
    *
    * Total cost: one range shuffle + one tiny agg + one map — no window
    * exchange, no driver data. Ties in `orderCol` get arbitrary but
    * contiguous ids (stamp a unique key for full determinism). */
  def globalIndex(df: DataFrame, orderCol: String, numParts: Int = 32,
                  outCol: String = "global_idx"): DataFrame = {
    val ranged = df.repartitionByRange(numParts, col(orderCol))
      .sortWithinPartitions(orderCol).localCheckpoint()
    val counts = ranged.groupBy(spark_partition_id().as("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // prefix offsets over ALL partition ids (range partitioning may
    // leave some empty; they contribute 0 and never appear in rows)
    val offsets = (0 until numParts)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetByPid = typedlit((0 until numParts).map(p => p -> offsets(p)).toMap)
    val pid = spark_partition_id()
    val local = monotonically_increasing_id() - shiftleft(pid.cast("long"), 33)
    ranged.withColumn(outCol, element_at(offsetByPid, pid) + local)
  }
}
