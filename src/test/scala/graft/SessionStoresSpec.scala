package graft

import org.scalatest.funsuite.AnyFunSuite

class SessionStoresSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("servedPath builds exactly once under concurrent first access") {
    // every session store rides this: if two queries race the first
    // touch, a double build is at best wasted minutes and at worst a
    // torn overwrite under a concurrent read
    val path = graft.sources.SessionStores.scopedPath("graft_test_store",
      "concurrent_" + System.nanoTime())
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def serve(): Long =
      graft.sources.SessionStores.servedPath(spark, path) {
        builds.incrementAndGet()
        Thread.sleep(200) // widen the race window
        (0L until 100L).toDF("v").write.mode("overwrite").parquet(path)
      }.count()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 4).map(_ => pool.submit(
        new java.util.concurrent.Callable[Long] { def call(): Long = serve() }))
      assert(futures.map(_.get()).forall(_ === 100L))
      assert(builds.get() === 1, s"store built ${builds.get()} times")
    } finally pool.shutdown()
  }

  test("servedPath keyed per path: distinct stores build independently") {
    val a = graft.sources.SessionStores.scopedPath("graft_test_store",
      "a_" + System.nanoTime())
    val b = graft.sources.SessionStores.scopedPath("graft_test_store",
      "b_" + System.nanoTime())
    val va = graft.sources.SessionStores.servedPath(spark, a) {
      Seq(1L).toDF("v").write.mode("overwrite").parquet(a)
    }.as[Long].head()
    val vb = graft.sources.SessionStores.servedPath(spark, b) {
      Seq(2L).toDF("v").write.mode("overwrite").parquet(b)
    }.as[Long].head()
    assert(va === 1L && vb === 2L)
  }
}
