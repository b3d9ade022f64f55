package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic pseudo-random lengths incl. zeros and budget-sized docs
  private lazy val lens = (0L until 500L)
    .map(i => (i, ((i * 7919) % 97) match { case m if m % 13 == 0 => 0L; case m => m }))
  private lazy val docs = lens.toDF("doc_id", "n_tok")

  private def expected(budget: Long): Seq[(Long, Long, Long, Long, Option[Long], Option[Long])] = {
    var acc = 0L
    lens.map { case (id, n) =>
      val start = acc; acc += n
      val (fc, lc) =
        if (n > 0) (Some(start / budget), Some((start + n - 1) / budget))
        else (None, None)
      (id, n, start, start + n, fc, lc)
    }
  }

  private def run(df: org.apache.spark.sql.DataFrame, budget: Long) =
    Packing.packedOffsets(df, budget)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq

  test("packed offsets equal the sequential cumsum, zero-token docs get null chunks") {
    assert(run(docs, 64L) === expected(64L))
  }

  test("offsets are identical under any input partitioning") {
    assert(run(docs.repartition(13), 64L) === expected(64L))
    assert(run(docs.repartition(1), 64L) === expected(64L))
  }

  test("chunk bounds respect the budget boundary exactly") {
    // 3 docs of exactly one budget each: chunks 0,1,2 with no overlap
    val exact = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("doc_id", "n_tok")
    assert(run(exact, 10L) === Seq(
      (1L, 10L, 0L, 10L, Some(0L), Some(0L)),
      (2L, 10L, 10L, 20L, Some(1L), Some(1L)),
      (3L, 10L, 20L, 30L, Some(2L), Some(2L))))
    // a doc straddling a boundary spans both chunks
    val straddle = Seq((1L, 7L), (2L, 6L)).toDF("doc_id", "n_tok")
    assert(run(straddle, 10L) === Seq(
      (1L, 7L, 0L, 7L, Some(0L), Some(0L)),
      (2L, 6L, 7L, 13L, Some(0L), Some(1L))))
  }

  test("cached input lineage is refused (the RangeRank exchange-reuse contract)") {
    val cached = docs.persist()
    try {
      cached.count()
      val e = intercept[IllegalArgumentException](Packing.packedOffsets(cached, 64L))
      assert(e.getMessage.contains("cached"))
    } finally cached.unpersist(): Unit
  }
}
