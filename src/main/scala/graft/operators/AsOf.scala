package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference lacks but a training-data
  * pipeline needs (prompt tier; natural surface: the `events` table).
  *
  * Both avoid the naive time-range cross join:
  *  - as-of = union-tag + running `last_value` — ONE shuffle on the key,
  *    no join at all, state bounded per key. This is the plan that holds
  *    at 100 TB: a range-condition join would degenerate to a per-key
  *    cross product under skew, while the window formulation streams
  *    each user's timeline once.
  *  - range join = equi-join on the key with the time band as a
  *    sort-merge post-filter; the equi key keeps it distributable, and
  *    the band bounds the per-key fan-out.
  */
object AsOf {

  /** As-of join: for each `leftType` event, the most recent `rightType`
    * event of the same user at-or-before it (ties at identical ts_ns
    * resolve right-before-left, i.e. `>=` semantics). Left rows with no
    * prior right event keep nulls — as-of LEFT join. */
  def asofJoin(events: DataFrame, leftType: String = "click",
               rightType: String = "view"): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin(leftType, rightType))
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      // at equal timestamps the right side must sort first so it is
      // visible to the left row (the ">=" in join terms)
      .withColumn("side", when(col("event_type") === rightType, 0).otherwise(1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("right_id",
        last(when(col("event_type") === rightType, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("right_ts_ns",
        last(when(col("event_type") === rightType, col("ts_ns")), ignoreNulls = true).over(w))
      .filter(col("event_type") === leftType)
      // µs-precision epochs on the output surface (cross-engine: DuckDB's
      // epoch extraction is µs-native); the JOIN itself used full nanos.
      .select(col("event_id").as("left_id"), col("user_id"),
        expr("ts_ns div 1000").as("left_ts_us"),
        col("right_id"), expr("right_ts_ns div 1000").as("right_ts_us"))
  }

  /** Range join: all (`leftType`, `rightType`) pairs of the same user
    * where the right event lands strictly after the left one and within
    * `windowSec`. Equi-join on user_id; the band is a post-filter. */
  def rangeJoin(events: DataFrame, leftType: String = "click",
                rightType: String = "purchase", windowSec: Long = 600): DataFrame = {
    // µs-precision band edges: cross-engine epoch extraction is µs-native,
    // so the boundary comparisons must happen at the same precision.
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("left_id"),
        expr("ts_ns div 1000").as("l_ts"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id"), col("event_id").as("right_id"),
        expr("ts_ns div 1000").as("r_ts"))
    l.join(r, Seq("user_id"))
      .filter(col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + lit(windowSec * 1000000L))
      .select(col("user_id"), col("left_id"), col("right_id"),
        expr("(r_ts - l_ts) div 1000000").as("gap_s"))
  }
}
