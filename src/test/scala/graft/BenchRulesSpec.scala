package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's transient-detection rules — pinned as a spec
  * because round 19 shipped a 2.5× headline inflation through a hole
  * in them: the dirty-pair rule was one-sided (`rep2 > 3·rep1`), so a
  * rep1 spike (golden_e2e [27.46, 8.06] against a 3.22 s anchor) never
  * triggered the end-of-sweep actuator rerun and the contended 8.06 s
  * min went into the official total. */
class BenchRulesSpec extends AnyFunSuite {

  test("the round-19 golden_e2e rep1 spike now flags, either order") {
    assert(Bench.isDirtyPair(27.461, 8.055), "rep1 spike (the r19 miss)")
    assert(Bench.isDirtyPair(8.055, 27.461), "rep2 spike (the old rule's case)")
    assert(Bench.isDirtyPair(0.910, 2.770),
      "r19's bpe_tokens pair, which the old rule DID catch, still flags")
  }

  test("small absolute jitter never flags, whatever the ratio") {
    assert(!Bench.isDirtyPair(0.02, 0.30), "0.28 s apart: under the 1 s floor")
    assert(!Bench.isDirtyPair(0.30, 0.02))
  }

  test("large but proportionate spread never flags") {
    assert(!Bench.isDirtyPair(10.0, 25.0), "2.5x is min-of-2 territory")
    assert(!Bench.isDirtyPair(25.0, 10.0))
  }

  test("boundary: both conditions must hold") {
    assert(Bench.isDirtyPair(1.0, 4.0), "4x and 3 s apart")
    assert(!Bench.isDirtyPair(1.0, 3.0), "exactly 3x is not >3x")
    assert(Bench.isDirtyPair(0.4, 1.5), "3.75x and 1.1 s apart")
    assert(!Bench.isDirtyPair(0.4, 1.35), "3.4x but only 0.95 s apart")
  }
}
