package graft

import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("corpusDelta classifies added / removed / changed and drops unchanged") {
    val oldSnap = snap(1L -> "alpha", 2L -> "beta", 3L -> "gamma", 4L -> "delta")
    val newSnap = snap(2L -> "beta", 3L -> "gamma EDITED", 5L -> "epsilon")
    val out = Snapshot.corpusDelta(oldSnap, newSnap)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq(
      (1L, "removed"), (3L, "changed"), (4L, "removed"), (5L, "added")))
    // hashes present exactly on the sides that exist
    val r3 = out.find(_.getLong(0) == 3L).get
    assert(r3.getString(2) != null && r3.getString(3) != null && r3.getString(2) != r3.getString(3))
    val r5 = out.find(_.getLong(0) == 5L).get
    assert(r5.isNullAt(2) && r5.getString(3) != null)
  }

  test("null text hashes as empty string: null -> '' edit is no change") {
    val oldSnap = Seq((1L, null: String), (2L, null: String)).toDF("doc_id", "text")
    val newSnap = Seq((1L, ""), (2L, "now set")).toDF("doc_id", "text")
    val out = Snapshot.corpusDelta(oldSnap, newSnap).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "changed")))
  }

  test("identical snapshots produce an empty delta") {
    val s0 = snap(1L -> "a", 2L -> "b")
    assert(Snapshot.corpusDelta(s0, s0).count() === 0L)
  }
}
