package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Validation
import graft.operators.Validation._

class ValidationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), 20.0),
    (3L, None, -5.0),
    (4L, Some("a"), 40.0)
  ).toDF("id", "cat", "x")

  test("validation computes all metrics in one pass with correct verdicts") {
    val out = Validation.run(df, Seq(
      completeness("cat"),            // 3/4 -> fail at default 1.0
      completeness("id"),             // 4/4 -> pass
      uniqueness("id"),               // 4/4 distinct -> pass
      uniqueness("cat"),              // 2 distinct / 4 rows -> fail
      minBound("x", atLeast = 0.0),   // min -5 -> fail
      maxBound("x", atMost = 100.0),  // max 40 -> pass
      distinctAtMost("cat", 5L)       // 2 <= 5 -> pass
    )).as[(String, Double, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    assert(out("completeness(cat)") === ((0.75, false)))
    assert(out("completeness(id)") === ((1.0, true)))
    assert(out("uniqueness(id)") === ((1.0, true)))
    assert(out("uniqueness(cat)") === ((0.5, false)))
    assert(out("min(x)") === ((-5.0, false)))
    assert(out("max(x)") === ((40.0, true)))
    assert(out("approx_domain(cat)") === ((2.0, true)))
  }

  test("validation suite is a single aggregate over a single scan") {
    val out = Validation.run(df, Seq(
      completeness("cat"), minBound("x", 0.0), maxBound("x", 100.0)))
    // no distinct aggregates here -> exactly one Aggregate pair over one
    // scan, no join/union re-reading the input
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"validation re-read the table:\n$plan")
    assert(!plan.contains("Union"), s"validation unioned per-check scans:\n$plan")
  }

  test("compliance measures predicate satisfaction ratio") {
    val out = Validation.run(df, Seq(
      compliance("positive_x", col("x") > 0, atLeast = 0.7)))
      .as[(String, Double, Boolean)].collect().head
    assert(out === (("compliance(positive_x)", 0.75, true)))
  }
}
