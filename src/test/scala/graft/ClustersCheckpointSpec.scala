package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Pins the DURABLE-checkpoint branch of `Dedup.clusters` (and
  * `materializeOnce`): local runs always fall back to `localCheckpoint`,
  * so until this spec the `checkpoint(reliable)` path — the one a real
  * cluster deployment takes, with its checkpoint-dir garbage registry —
  * was dead code in CI. Sets a temp checkpoint dir on the shared context,
  * re-runs label propagation, and asserts identical components, then
  * restores the context and releases the recorded checkpoint dirs.
  */
class ClustersCheckpointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("clusters(): durable-checkpoint branch equals localCheckpoint branch") {
    import spark.implicits._
    // chain, pair, triangle, and a >1-hop chain that needs pointer jumps
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L), (31L, 32L), (33L, 32L), (34L, 33L)
    ).toDF("doc_a", "doc_b")

    def run(): Map[Long, Long] =
      Dedup.clusters(pairs).as[(Long, Long)].collect().toMap

    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "precondition: the shared test context must start on the local branch")
    val local = run()

    val base = java.nio.file.Files.createTempDirectory("graft-ckpt-spec-")
    try {
      sc.setCheckpointDir(base.toString)
      assert(sc.getCheckpointDir.isDefined)
      val durable = run()
      assert(durable === local, "durable and local checkpoint branches diverged")
      // min-id label propagation: every node labels to its component min
      val expected = Map(
        1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 10L, 11L -> 10L,
        20L -> 20L, 21L -> 20L, 22L -> 20L,
        30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L, 34L -> 30L)
      assert(durable === expected)
      // the run must actually have recorded+written reliable checkpoints
      val perCtx = new java.io.File(base.toString).listFiles()
      assert(perCtx != null && perCtx.nonEmpty,
        "durable run wrote no checkpoint files — the reliable branch didn't engage")
    } finally {
      // restore the shared context to the local branch for later suites:
      // checkpointDir is private[spark] (public at bytecode level)
      sc.getClass.getMethods.find(_.getName == "checkpointDir_$eq")
        .foreach(_.invoke(sc, None))
      assert(sc.getCheckpointDir.isEmpty)
      // drop the recorded checkpoint dirs (results already collected; no
      // cached dedup relations were built under the durable dir)
      Dedup.releaseCheckpoints(spark)
      // releaseCheckpoints removes the per-context UUID subdir; the spec
      // owns the temp base itself
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile): Unit
    }
  }
}
