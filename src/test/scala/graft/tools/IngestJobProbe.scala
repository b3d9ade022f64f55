package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe (test scope, not part of the engine): counts the Spark jobs
  * one `StreamingDedup.processBatch` micro-batch schedules — the metric
  * behind the BASELINE.md build-cost note that local stream-ingest cost
  * is job-count-dominated. Run:
  *   sbt "Test/runMain graft.tools.IngestJobProbe /root/testdata/sf0.01"
  */
object IngestJobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.util.EngineSession.builder("local[32]", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val verbose = args.length > 1 && args(1) == "-v"
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val stages = js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
        starts.put(js.jobId, (js.time, stages.take(120))): Unit
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(starts.get(je.jobId)).foreach { case (t0, name) =>
          println(f"JOBDUR ${je.time - t0}%5d ms :: $name")
        }
    })
    val path = java.nio.file.Files.createTempDirectory("jobprobe").toString + "/store"
    val d = graft.sources.Corpus.documents(spark, dir).select("doc_id", "text")
    for (b <- 0 until 3) {
      val before = jobs.get()
      val t0 = System.nanoTime()
      graft.streaming.StreamingDedup.processBatch(
        d.filter(col("doc_id") % 3 === b), b, path): Unit
      println(f"JOBPROBE batch=$b jobs=${jobs.get() - before} " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
