package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Percentiles

class PercentilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent reference: NumPy/DuckDB "linear" interpolation. */
  private def refQuantile(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted
    val pos = p * (s.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    val f = pos - lo
    BigDecimal(s(lo) * (1 - f) + s(hi) * f)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("sort-based quantiles match linear interpolation on known groups") {
    val a = Seq(10.0, 20.0, 30.0, 40.0) // p50 = 25.0, p25 = 17.5
    val b = Seq(5.0, 6.0, 100.0)        // p50 = 6.0
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("k", "v")
    val got = Percentiles.exactQuantiles(df, "k", "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") === (("a", refQuantile(a, 0.25), refQuantile(a, 0.5), refQuantile(a, 0.75), 4L)))
    assert(got("b") === (("b", refQuantile(b, 0.25), refQuantile(b, 0.5), refQuantile(b, 0.75), 3L)))
  }

  test("single-element group: every quantile is the element itself") {
    val got = Percentiles.exactQuantiles(Seq(("x", 7.5)).toDF("k", "v"), "k", "v",
        Seq("p50" -> 0.5))
      .as[(String, Double, Long)].head()
    assert(got === (("x", 7.5, 1L)))
  }

  test("boundary quantiles p=0 and p=1 are min and max") {
    val vs = Seq(3.0, 1.0, 2.0)
    val got = Percentiles.exactQuantiles(vs.map(("k", _)).toDF("k", "v"), "k", "v",
        Seq("lo" -> 0.0, "hi" -> 1.0))
      .as[(String, Double, Double, Long)].head()
    assert(got === (("k", 1.0, 3.0, 3L)))
  }

  test("nulls are ignored, matching quantile_cont semantics") {
    val df = Seq(("k", Some(1.0)), ("k", None), ("k", Some(3.0)), ("k", None))
      .toDF("k", "v")
    val got = Percentiles.exactQuantiles(df, "k", "v", Seq("p50" -> 0.5))
      .as[(String, Double, Long)].head()
    assert(got === (("k", 2.0, 2L))) // median of {1, 3}; nulls neither counted nor sorted
  }

  test("width stress: shuffle partitions >> group count, ties spanning range boundaries") {
    // The documented degenerate cases at once: far more range partitions
    // than (key, value) diversity — most partitions end up EMPTY or
    // mid-tie — and long runs of equal values that the range partitioner
    // must split across partition boundaries. Quantiles must still equal
    // the reference interpolation exactly.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      // 3 groups × 500 rows drawn from just 3 distinct values each: ties
      // vastly outnumber the 64-way partitioning, so equal-value runs
      // necessarily span boundaries
      val data = for {
        (k, base) <- Seq(("a", 1.0), ("b", 10.0), ("c", -5.0))
        i <- 0 until 500
      } yield (k, base + (i % 3))
      val df = data.toDF("k", "v")
      val got = Percentiles.exactQuantiles(df, "k", "v",
          Seq("p10" -> 0.10, "p50" -> 0.5, "p90" -> 0.90))
        .as[(String, Double, Double, Double, Long)].collect()
        .map(r => r._1 -> r).toMap
      for ((k, base) <- Seq(("a", 1.0), ("b", 10.0), ("c", -5.0))) {
        val vs = (0 until 500).map(i => base + (i % 3))
        assert(got(k) === ((k, refQuantile(vs, 0.10), refQuantile(vs, 0.5),
          refQuantile(vs, 0.90), 500L)), s"group $k")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sf0.1 stress: q_percentiles at shuffle.partitions=64 equals the reference interpolation exactly") {
    // The toy width-stress above plants the degenerate shapes; this runs
    // the REAL bench query (lineitem l_extendedprice by l_returnflag,
    // ~600k rows at sf0.1) at a partition width that guarantees ties and
    // group runs span range-partition boundaries, and checks every cell
    // against the independent driver-side interpolation — the same
    // quantile_cont semantics the DuckDB oracle pins at sf0.01.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val li = graft.sources.Tables.tbl(spark, "/root/testdata/sf0.1", "lineitem")
      val got = Percentiles.exactQuantiles(li, "l_returnflag", "l_extendedprice",
          Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
        .as[(String, Double, Double, Double, Long)].collect()
        .map(r => r._1 -> r).toMap
      val byFlag = li.select($"l_returnflag", $"l_extendedprice".cast("double"))
        .as[(String, Double)].collect().groupBy(_._1)
      assert(got.keySet === byFlag.keySet)
      for ((k, rows) <- byFlag) {
        val vs = rows.map(_._2).toSeq
        assert(got(k) === ((k, refQuantile(vs, 0.25), refQuantile(vs, 0.5),
          refQuantile(vs, 0.75), vs.length.toLong)), s"group $k at width 64")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("cached-lineage input is refused — exchange reuse silently breaks under InMemoryRelation") {
    // an InMemoryTableScan under the range exchange stops the stats and
    // rank branches canonicalizing equal: two exchanges materialize with
    // independently sampled boundaries and the offsets describe the
    // wrong layout (observed: duplicate ranks, max rank > group size).
    // The operator must fail loudly, not serve corrupted ranks.
    val base = spark.range(1000).selectExpr("CAST(id % 3 AS STRING) AS k", "CAST(id AS DOUBLE) AS v")
    val cachedDim = spark.range(3).selectExpr("CAST(id AS STRING) AS k", "id AS w").cache()
    try {
      cachedDim.count() // materialize
      val withCached = base.join(cachedDim, "k").select($"k", ($"v" + $"w").as("v"))
      val e = intercept[IllegalArgumentException] {
        Percentiles.exactQuantiles(withCached, "k", "v", Seq("p50" -> 0.5))
      }
      assert(e.getMessage.contains("cached"))
      // the same relation through a parquet round-trip is accepted
      val dir = java.nio.file.Files.createTempDirectory("graft_rr_store").toString
      withCached.write.mode("overwrite").parquet(dir)
      val ok = Percentiles.exactQuantiles(
        spark.read.parquet(dir), "k", "v", Seq("p50" -> 0.5))
      assert(ok.count() === 3)
    } finally cachedDim.unpersist(): Unit
  }

  test("one hot key spreads across more than one task (parallelism is data-sized)") {
    // 20k rows of a SINGLE key: the old per-key window ranked these in
    // exactly one task; range repartitioning must use several. AQE's
    // small-partition coalescing is disabled for the assertion — at this
    // toy size it (correctly) folds everything into one task, which
    // would hide the range spread the operator exists to provide.
    val prev = spark.conf.getOption("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val df = spark.range(20000).selectExpr("'hot' AS k", "CAST(id AS DOUBLE) AS v")
    val ranked = Percentiles.rankedByRange(df, "k", "v").cache()
    try {
      val pids = ranked.select("_pid").distinct().count()
      assert(pids > 1, s"expected >1 partitions for the hot key, got $pids")
      // and the offset-adjusted ranks are still the exact global ranks
      val wrong = ranked.filter($"_rn" =!= $"_v" + 1).count()
      assert(wrong === 0)
      val got = Percentiles.exactQuantiles(df, "k", "v",
          Seq("p25" -> 0.25, "p99" -> 0.99))
        .as[(String, Double, Double, Long)].head()
      assert(got === (("hot", refQuantile((0 until 20000).map(_.toDouble), 0.25),
        refQuantile((0 until 20000).map(_.toDouble), 0.99), 20000L)))
    } finally {
      ranked.unpersist()
      prev.fold(spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled"))(
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", _))
    }
  }
}
