package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench fixture-dir contract (VERDICT r16 #3): positional argv
  * wins, env falls back, extra arguments are an error — never a silent
  * wrong-fixture run.
  */
class BenchArgsSpec extends AnyFunSuite {
  test("Bench sfDir: argv wins, env falls back, extra args rejected") {
    assert(Bench.resolveSfDir(Array("/x"), Map("SPARK_GRAFT_SF_DIR" -> "/y"))
      == Right("/x"))
    assert(Bench.resolveSfDir(Array.empty, Map("SPARK_GRAFT_SF_DIR" -> "/y"))
      == Right("/y"))
    assert(Bench.resolveSfDir(Array.empty, Map.empty)
      == Right("/root/testdata/sf0.1"))
    assert(Bench.resolveSfDir(Array("/x", "oops"), Map.empty).isLeft)
  }

  test("steal stamp: per-window percentage, -1 sentinel on failed snapshots") {
    // 1000 ticks elapsed, 50 of them steal -> 5%.
    assert(Bench.stealBetween((10000L, 100L), (11000L, 150L)) == 5.0)
    // A failed FIRST snapshot must be the sentinel, not cumulative-since-
    // boot (ADVICE r17); same for a failed/regressed second snapshot.
    assert(Bench.stealBetween((0L, 0L), (11000L, 150L)) == -1.0)
    assert(Bench.stealBetween((10000L, 100L), (0L, 0L)) == -1.0)
    assert(Bench.stealBetween((10000L, 100L), (10000L, 100L)) == -1.0)
  }
}
