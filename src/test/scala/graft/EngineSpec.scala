package graft

import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("registry resolves known pipelines and every query has an oracle") {
    assert(Engine.pipeline("q1_agg") != null)
    // EVERY registered query is oracle-checked — r12 closed the last
    // rows-only exception (q_vocab_hll registers its deterministic
    // relative-error projection like the rest of the sketch family).
    // A new query without an oracle fails here, not silently at the
    // driver's gate.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("unknown pipeline name fails fast with the catalog in the message") {
    val e = intercept[NoSuchElementException](Engine.pipeline("q_nope"))
    assert(e.getMessage.contains("q_nope"))
    assert(e.getMessage.contains("q1_agg"))
  }

  test("a pipeline runs end-to-end through the facade") {
    assert(Engine.run(spark, "q_doc_freq", "/root/testdata/sf0.001").count() > 0)
  }
}
