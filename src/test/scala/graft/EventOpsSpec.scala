package graft

import graft.operators.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, ts_ns, user_id, value) — gap threshold 1800 s
  private val S = 1000000000L
  private def ev(rows: (Long, Long, Long, Double)*) =
    rows.toDF("event_id", "ts_ns", "user_id", "value")

  test("sessionize splits on gaps greater than gapSec") {
    val events = ev(
      (1L, 0L, 1L, 1.0),
      (2L, 1000L * S, 1L, 2.0),   // gap 1000s ≤ 1800 → same session
      (3L, 3000L * S, 1L, 3.0),   // gap 2000s > 1800 → new session
      (4L, 0L, 2L, 4.0))
    val out = EventOps.sessionize(events, gapSec = 1800)
      .orderBy("user_id", "session_idx").collect()
    assert(out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
      r.getAs[Long]("n_events"))).toSeq ===
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
    assert(out.head.getAs[Long]("session_start") === 0L)
    assert(out.head.getAs[Long]("session_end") === 1000L)
  }

  test("sessionize gap is measured on floor-second epochs (boundary exact)") {
    // 1800.999… s apart in nanos but exactly 1800 in floor-seconds → same session
    val events = ev((1L, 0L, 1L, 1.0), (2L, 1800L * S + 999999999L, 1L, 1.0))
    val out = EventOps.sessionize(events, gapSec = 1800).collect()
    assert(out.length === 1)
  }

  test("latestPerKey keeps the newest row per user with id tiebreak") {
    val events = Seq(
      (1L, 100L, 1L, "a", 1.0, ""), (2L, 200L, 1L, "b", 2.0, ""),
      (3L, 200L, 1L, "c", 3.0, ""), (4L, 50L, 2L, "d", 4.0, ""))
      .toDF("event_id", "ts_ns", "user_id", "event_type", "value", "props")
    val out = EventOps.latestPerKey(events).orderBy("user_id").collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq === Seq(3L, 4L))
  }

  test("propsHistogram extracts and groups a JSON key") {
    val events = Seq((1L, """{"k": 5}"""), (2L, """{"k": 5}"""), (3L, """{"x": 1}"""))
      .toDF("event_id", "props")
    val out = EventOps.propsHistogram(events).orderBy("k").collect()
    // Spark sorts nulls first ascending
    assert(out.map(r => (Option(r.get(0)), r.getLong(1))).toSeq ===
      Seq((None, 1L), (Some(5), 2L)))
  }

  test("funnel stages must happen in order; depth counts the reached prefix") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: purchase BEFORE click → depth stops at click
      (2L, "view", 100L), (2L, "purchase", 150L), (2L, "click", 200L),
      // user 3: view only
      (3L, "view", 100L),
      // user 4: click without view → not in the funnel at all
      (4L, "click", 100L))
      .toDF("user_id", "event_type", "ts_ns")
    val out = EventOps.funnel(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getInt(4)))
    assert(out.toSeq === Seq(
      (1L, Some(100L), Some(200L), Some(300L), 3),
      (2L, Some(100L), Some(200L), None, 2),
      (3L, Some(100L), None, None, 1)))
  }
}
