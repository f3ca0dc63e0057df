package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators._

/** Events / index-maintenance tier (SURVEY §2.1, §2.10): upsert/delete/retention, event windows, streaming lifecycles.
  * One `queries` entry per operator with its DuckDB oracle twin;
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]. */
private[graft] trait EntryEvents extends EntryShared {

  protected def eventsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_tumbling" -> ((s, d) => EventOps.tumblingAgg(Tables.events(s, d))),
    "events_sessionize" -> ((s, d) => EventOps.sessionize(Tables.events(s, d))),
    "upsert_latest" -> ((s, d) => EventOps.latestPerKey(Tables.events(s, d))),
    "delete_by_ids" -> ((s, d) => {
      val ev = Tables.events(s, d)
      EventOps.deleteByIds(ev, ev.filter(col("event_id") % 97 === 0).select("event_id"))
        .select("event_id")
    }),
    "retention_recent" -> ((s, d) =>
      EventOps.retention(Tables.events(s, d), maxAgeSec = 7 * 86400)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))),
    // funnel on µs-truncated times: DuckDB's TIMESTAMP_NS reader only
    // surfaces microseconds, so both engines must compare at µs grain,
    "funnel_steps" -> ((s, d) =>
      EventOps.funnel(Tables.events(s, d)
        .withColumn("ts_ns", expr("ts_ns div 1000")))),
    "asof_join" -> ((s, d) => AsOf.asofJoin(Tables.events(s, d))),
    "range_join" -> ((s, d) => AsOf.rangeJoin(Tables.events(s, d), windowSec = 600)),
    "json_props" -> ((s, d) => EventOps.propsHistogram(Tables.events(s, d))),
    "s11_chunks_json" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), to_json(struct(col("doc_id"), col("n_chars"))).as("js"))),

    // --- multimodal tier ----------------------------------------------
    // real JDK-codec decode kernels (ImageIO / javax.sound.sampled) over
    // deterministic BMP/PNG/WAV fixtures; oracle VALUES derived from the
    // pixel/PCM formulas by an independent implementation,
  )

  protected def eventsOracles: Map[String, String] = Map(
    "funnel_steps" ->
      """WITH s1 AS (
        | SELECT user_id, min(epoch_us(ts)) AS t1
        | FROM events WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        | SELECT s1.user_id, s1.t1, min(e.tn) AS t2
        | FROM s1 LEFT JOIN (
        |   SELECT user_id, epoch_us(ts) AS tn FROM events WHERE event_type = 'click') e
        |  ON e.user_id = s1.user_id AND e.tn > s1.t1
        | GROUP BY s1.user_id, s1.t1),
        |s3 AS (
        | SELECT s2.user_id, s2.t1, s2.t2, min(e.tn) AS t3
        | FROM s2 LEFT JOIN (
        |   SELECT user_id, epoch_us(ts) AS tn FROM events WHERE event_type = 'purchase') e
        |  ON e.user_id = s2.user_id AND e.tn > s2.t2
        | GROUP BY s2.user_id, s2.t1, s2.t2)
        |SELECT user_id, t1, t2, t3,
        | 1 + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
        |   + (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS funnel_depth
        |FROM s3""".stripMargin,
    "events_tumbling" ->
      """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS win_start, event_type,
        | count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sessionize" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id, value,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |y AS (
        | SELECT *, CASE WHEN prev_ts IS NULL
        |   OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |  THEN 1 ELSE 0 END AS new_session FROM x),
        |z AS (
        | SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM y)
        |SELECT user_id, session_idx,
        | CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
        | CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end,
        | count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM z GROUP BY user_id, session_idx""".stripMargin,
    "upsert_latest" ->
      """SELECT user_id, event_id, event_type,
        | CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch, round(value, 4) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,
    "delete_by_ids" ->
      "SELECT event_id FROM events WHERE event_id % 97 <> 0",
    "retention_recent" ->
      """SELECT event_type, count(*) AS n_events FROM events
        |WHERE CAST(floor(epoch(ts)) AS BIGINT) >=
        | (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) FROM events) - 604800
        |GROUP BY event_type""".stripMargin,
    "asof_join" ->
      """SELECT c.event_id AS left_id, c.user_id, epoch_us(c.ts) AS left_ts_us,
        | v.event_id AS right_id, epoch_us(v.ts) AS right_ts_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        | ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin,
    "range_join" ->
      """SELECT l.user_id, l.event_id AS left_id, r.event_id AS right_id,
        | (epoch_us(r.ts) - epoch_us(l.ts)) // 1000000 AS gap_s
        |FROM events l JOIN events r ON l.user_id = r.user_id
        |WHERE l.event_type = 'click' AND r.event_type = 'purchase'
        | AND epoch_us(r.ts) > epoch_us(l.ts)
        | AND epoch_us(r.ts) <= epoch_us(l.ts) + 600000000""".stripMargin,
    "json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        | count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "s11_chunks_json" ->
      """SELECT doc_id,
        | to_json(struct_pack(doc_id := doc_id, n_chars := n_chars))::VARCHAR AS js
        |FROM documents""".stripMargin,

    // The OCR fixture's ground-truth strings, stated directly,
  )
}
