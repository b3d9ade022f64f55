package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-runs EVERY registered query at sf0.001 so `sbt test` catches
  * runtime breaks (analysis errors, bad column refs, missing functions)
  * without waiting for the driver's verify pass. Correctness vs the
  * DuckDB oracle is the driver's gate; this only asserts execution and
  * non-degenerate output where guaranteed.
  */
class AllQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // pair-mining queries may legitimately return few rows; everything else
  // must return at least one
  private val mayBeSmall = Set("q_dedup_near", "q_simhash_pairs", "q_embed_dup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, dir).count()
      if (!mayBeSmall(name)) assert(n > 0, s"$name returned 0 rows")
      else assert(n >= 0)
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
