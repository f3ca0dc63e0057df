package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table operators: the index-maintenance family (S12-S16 upsert /
  * delete / retention, SURVEY.md §2.1) exercised on the `events` table,
  * plus the event-time windowing the reference lacks (§2.10) — tumbling
  * windows and gap-based sessionization. Timestamps are emitted as epoch
  * seconds (BIGINT) so results hash identically across engines.
  */
object EventOps {

  /** Tumbling event-time window aggregate: `window(ts, widthSec)` →
    * per-(window, event_type) count + sum. Spark's `window()` starts are
    * epoch-aligned, identical to floor(epoch/width)*width. Partial
    * (map-side) aggregation before the shuffle — the 100 TB-safe shape. */
  def tumblingAgg(events: DataFrame, widthSec: Int = 600): DataFrame =
    events
      .groupBy(window(col("ts"), s"$widthSec seconds").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization (batch formulation): a new session starts
    * when the gap to the previous event of the same user exceeds
    * `gapSec`. Classic gaps-and-islands: lag → boundary flag → running
    * sum = session index → aggregate. One shuffle on user_id; state is
    * per-user and bounded. (The Structured Streaming face of this is
    * `session_window` / `flatMapGroupsWithState` — graft.streaming.) */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    // Order by the full-precision nanos column: two events in the same
    // microsecond must still sessionize identically across engines.
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    events
      .withColumn("epoch_s", expr("ts_ns div 1000000000"))
      .withColumn("prev_epoch_s", lag(col("epoch_s"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_epoch_s").isNull ||
          col("epoch_s") - col("prev_epoch_s") > gapSec, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("epoch_s")).as("session_start"),
        max(col("epoch_s")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** S12 — upsert as last-write-wins: latest row per key (reference
    * re-upserts overwrite by chunk_id, `pinecone_manager.py:78,90`).
    * `row_number() = 1` over (key, ts desc) — WindowGroupLimit applies. */
  def latestPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000000000").as("ts_epoch"), round(col("value"), 4).as("value"))
  }

  /** S14 — delete by id set: left-anti join against tombstones. */
  def deleteByIds(events: DataFrame, tombstones: DataFrame): DataFrame =
    events.join(tombstones, Seq("event_id"), "left_anti")

  /** JSON scalar extraction over the open `props` column (the
    * reference's schemaless metadata maps, SURVEY.md §1.2/§2.9 json
    * family): pull a key out of each JSON string and aggregate. Pushed
    * into one pass — extract + cast + hash-aggregate, no UDF. */
  def propsHistogram(events: DataFrame, key: String = "k"): DataFrame =
    events
      .select(get_json_object(col("props"), s"$$.$key").cast("int").as(key))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_events"))

  /** S16 — retention by age: keep rows within `maxAgeSec` of the newest
    * event (reference cache eviction, `ingestion_service.py:418-437`). */
  def retention(events: DataFrame, maxAgeSec: Long): DataFrame = {
    val cutoff = events.agg(max(expr("ts_ns div 1000000000")).as("max_e"))
    events.crossJoin(broadcast(cutoff))
      .filter(expr("ts_ns div 1000000000") >= col("max_e") - maxAgeSec)
      .drop("max_e")
  }

  /** Funnel analysis: for each user, the earliest time they completed
    * each `steps` stage IN ORDER — t(k) = min event time of step k that
    * is strictly after t(k-1); a user's funnel depth is the last non-null
    * stage. Built as one conditional-min aggregation per step with the
    * previous stage's time joined back in: |steps| small aggregates on
    * the user key (each partial-combined map-side), no window over the
    * raw event stream, no ordering assumption on the input — the shape
    * that survives an unordered 100 TB event log. Times are raw int64
    * nanos: exact, no float involved. */
  def funnel(events: DataFrame, steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty)
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t1"))
    val result = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val nexts = events.filter(col("event_type") === step)
        .select(col("user_id").as("_u"), col("ts_ns").as("_t"))
      acc.join(nexts, col("user_id") === col("_u") && col("_t") > col(s"t$i"), "left")
        .groupBy(acc.columns.map(col): _*)
        .agg(min(col("_t")).as(s"t${i + 1}"))
    }
    val depth = steps.indices.tail
      .map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduceOption(_ + _).map(_ + 1).getOrElse(lit(1))
    result.withColumn("funnel_depth", depth)
  }
}
