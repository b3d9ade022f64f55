package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int): Timestamp = new Timestamp(60000L * m)

  test("as-of join picks the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, 100L, ts(5)), (2L, 100L, ts(15)), (3L, 100L, ts(25)),
      (4L, 200L, ts(10)), (5L, 300L, ts(10))
    ).toDF("event_id", "user_id", "t")
    val right = Seq(
      (100L, ts(10), 91L), (100L, ts(20), 92L), // user 100: two markers
      (200L, ts(10), 93L) // user 200: marker exactly AT the event (inclusive)
    ).toDF("user_id", "t", "event_id")
    val got = AsOf.joinAsOf(left, right, "user_id", "t", "event_id", "m")
      .select("event_id", "m").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === None) // before any marker
    assert(got(2L) === Some(91L)) // latest <= 15 is the 10-minute marker
    assert(got(3L) === Some(92L))
    assert(got(4L) === Some(93L)) // equal timestamps match (inclusive)
    assert(got(5L) === None) // user with no markers at all
  }

  test("as-of join is repartition-invariant") {
    val left = (1 to 50).map(i => (i.toLong, (i % 5).toLong, ts(i))).toDF("event_id", "user_id", "t")
    val right = (1 to 10).map(i => ((i % 5).toLong, ts(i * 4), i * 100L)).toDF("user_id", "t", "event_id")
    val a = AsOf.joinAsOf(left, right, "user_id", "t", "event_id", "m")
      .as[(Long, Long, Timestamp, Option[Long])].collect().toSet
    val b = AsOf.joinAsOf(left.repartition(7), right.repartition(3), "user_id", "t", "event_id", "m")
      .as[(Long, Long, Timestamp, Option[Long])].collect().toSet
    assert(a === b)
  }
}
