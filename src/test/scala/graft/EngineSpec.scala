package graft

import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("registry resolves known pipelines and every query has an oracle") {
    assert(Engine.pipeline("q1_agg") != null)
    // every registered query is oracle-checked except the DECLARED
    // rows-only sketch entries (approximate values are engine-specific
    // by construction — error bounds asserted in SketchesSpec); nothing
    // else may silently skip the value oracle. MG/CMS/GK register their
    // deterministic guarantee projections and ARE oracle-checked (r11);
    // HLL stays rows-only (no deterministic bound exists for it).
    val rowsOnlyByDesign = Set("q_vocab_hll")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(missing.isEmpty, s"queries without oracle: $missing")
    assert((rowsOnlyByDesign -- SparkEntry.queries.keySet).isEmpty)
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
