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
}
