package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must hand every configured session the
  * graft functions without any imperative registration call — the way a
  * cluster operator would deploy the library
  * (`spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensionsSpec extends AnyFunSuite with SparkFixture with BeforeAndAfterAll {

  private var extended: SparkSession = _
  private var priorDefault: Option[SparkSession] = None

  override def beforeAll(): Unit = {
    // Force the fixture session into existence first so its SparkContext
    // is reused, then build a SEPARATE session (new sessionState) with
    // the extensions applied — getOrCreate only builds fresh when no
    // default session is active.
    spark.sparkContext
    priorDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // `spark.sql.extensions` is a STATIC conf read from the SparkContext
    // at creation; the suite JVM's context already exists, so inject the
    // same instance through the builder hook — the identical code path
    // the conf-based loader invokes on a real cluster.
    extended = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    // Restore the shared fixture session for the rest of the suite run.
    priorDefault.foreach { s =>
      SparkSession.setDefaultSession(s)
      SparkSession.setActiveSession(s)
    }
  }

  test("configured session resolves graft functions with no registration call") {
    assert(extended ne spark, "must be a distinct session")
    val row = extended.sql(
      """SELECT rolling_hash('abc') AS rh,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vd,
        |  ngram_shingles('a b c d', 3) AS sh,
        |  winnow_hashes('abcdefghij', 8, 4) AS wf,
        |  vec_sqdist(array(1.0D, 2.0D), array(3.0D, 5.0D)) AS sq,
        |  vec_sqdist(array(CAST(1.5 AS FLOAT)), array(0.5D)) AS sqf""".stripMargin)
      .collect()(0)
    assert(row.getLong(0) == graft.functions.RollingHash.hash("abc"))
    assert(row.getDouble(1) == 11.0)
    // (1-3)^2 + (2-5)^2, and the mixed float/double widening path.
    assert(row.getDouble(4) == 13.0)
    assert(row.getDouble(5) == 1.0)
    assert(row.getSeq[String](2) == Seq("a b c", "b c d"))
    // 3 grams < w=4 -> one window: the min of the three 8-gram hashes.
    assert(row.getSeq[Long](3) ==
      Seq(Seq("abcdefgh", "bcdefghi", "cdefghij")
        .map(graft.functions.RollingHash.hash).min))
  }

  test("the un-extended fixture session is unaffected") {
    // (GraftFunctions.register may have run in other suites; only assert
    // the extended session works independently of it.)
    assert(extended.sessionState ne spark.sessionState)
  }
}
