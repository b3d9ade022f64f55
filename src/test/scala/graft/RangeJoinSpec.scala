package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed range join equals a direct non-equi join") {
    val left = (0 until 100).map(i => (i.toLong, i * 0.7)).toDF("id", "v")
    val right = Seq((0.0, 10.0, "a"), (9.5, 20.0, "b"), (35.0, 70.0, "c")).toDF("lo", "hi", "tier")
    val bucketed = RangeJoin.byBucket(left, "v", right, "lo", "hi", bucketWidth = 7.0)
      .select("id", "tier").as[(Long, String)].collect().toSet
    val direct = left.join(right, $"v" >= $"lo" && $"v" < $"hi")
      .select("id", "tier").as[(Long, String)].collect().toSet
    assert(bucketed === direct)
    // overlapping intervals produce both matches
    assert(bucketed.count(_._2 == "a") > 0 && bucketed.count(_._2 == "b") > 0)
  }

  test("boundary values: lo inclusive, hi exclusive") {
    val left = Seq((1L, 10.0), (2L, 19.999), (3L, 20.0)).toDF("id", "v")
    val right = Seq((10.0, 20.0, "t")).toDF("lo", "hi", "tier")
    val got = RangeJoin.byBucket(left, "v", right, "lo", "hi", 5.0)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }
}
