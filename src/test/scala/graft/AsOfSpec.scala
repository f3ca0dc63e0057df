package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, ts_ns, user_id, event_type)
  private def events(rows: (Long, Long, Long, String)*) =
    rows.toDF("event_id", "ts_ns", "user_id", "event_type")

  test("as-of picks the most recent right event at-or-before each left") {
    val ev = events(
      (1L, 100L, 1L, "view"),
      (2L, 200L, 1L, "view"),
      (3L, 250L, 1L, "click"), // → view 2 @200
      (4L, 300L, 1L, "view"),
      (5L, 300L, 1L, "click"), // tie: view @300 counts (>= semantics)
      (6L, 50L, 2L, "click"))  // no prior view → nulls
    val out = AsOf.asofJoin(ev).orderBy("left_id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(3)))).toSeq ===
      Seq((3L, Some(2L)), (5L, Some(4L)), (6L, None)))
  }

  test("range join pairs rights strictly after lefts within the band") {
    val ev = events(
      (1L, 1000000000L, 1L, "click"),
      (2L, 2000000000L, 1L, "purchase"),  // +1s → in band
      (3L, 700000000000L, 1L, "purchase"), // +699s → out of 600s band
      (4L, 1000000000L, 2L, "purchase"))   // other user, same ts as click 1
    val out = AsOf.rangeJoin(ev, windowSec = 600).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((1L, 2L, 1L)))
  }

  test("range join boundary: exactly windowSec is included, 0 gap excluded") {
    val ev = events(
      (1L, 0L, 1L, "click"),
      (2L, 600L * 1000000000L, 1L, "purchase"), // exactly 600s → included
      (3L, 0L, 1L, "purchase"))                 // same instant → excluded
    val out = AsOf.rangeJoin(ev, windowSec = 600).collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L))
  }
}
