package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Z-order layout clustering: key correctness against an independent
  * bit-interleave reference, the file-skipping property measured from
  * the written files' own min/max bounds, and layout-invariance of
  * query results.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Independent reference Morton interleave (bit loop, no magic masks). */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }

  test("zorderKey matches the reference interleave on identity-scaled values") {
    import spark.implicits._
    // lo=0, hi=65535 makes scale16 the identity on [0, 65535]
    val samples = Seq(0L, 1L, 2L, 3L, 255L, 256L, 32767L, 32768L, 65535L)
    val rows = for (x <- samples; y <- samples) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey(col("x"), 0, 65535, col("y"), 0, 65535).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === mortonRef(x, y), s"interleave($x, $y)")
    }
    // the curve key is monotone in each dim when the other is fixed
    val inc = samples.map(x => mortonRef(x, 1234L))
    assert(inc === inc.sorted)
  }

  /** Deterministic pseudo-uniform 2-D data: both dims mix i by odd
    * multipliers mod 100000 — independent enough that a linear sort on
    * one dim leaves the other spanning the full range in every file.
    */
  private def uniform2d = {
    import spark.implicits._
    (0 until 100000).map { i =>
      (i.toLong, (i.toLong * 48271L) % 100000L, (i.toLong * 69621L) % 100000L)
    }.toDF("id", "x", "y")
  }

  test("z-ordered files bound BOTH dims: a single-dim slice skips most files; a linear sort skips none") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val df = uniform2d
    // linear layout: clustered on x only — the y bounds of every file
    // span the whole range, so a y-predicate can never skip
    df.repartitionByRange(32, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")
    Layout.writeZOrdered(df, s"$dir/zorder", "x", "y", numFiles = 32)

    // y-only slice (6% of the range, x unconstrained)
    val (skipLin, totLin) =
      Layout.skippableFiles(spark, s"$dir/linear", "x", "y", 0, 99999, 10000, 16000)
    val (skipZ, totZ) =
      Layout.skippableFiles(spark, s"$dir/zorder", "x", "y", 0, 99999, 10000, 16000)
    assert(totLin === 32 && totZ === 32)
    assert(skipLin <= 2, s"x-sorted layout should not skip on a y slice, skipped $skipLin")
    assert(skipZ >= 16, s"z-order should skip most files on a y slice, skipped $skipZ")

    // selective box on both dims: nearly everything is skippable
    val (skipBox, _) =
      Layout.skippableFiles(spark, s"$dir/zorder", "x", "y", 20000, 26000, 50000, 56000)
    assert(skipBox >= 24, s"z-order box skip too weak: $skipBox of 32")

    // layout never changes semantics: the box query over the z-ordered
    // copy equals the same filter over the original frame
    import spark.implicits._
    val boxed = spark.read.parquet(s"$dir/zorder")
      .filter(col("x").between(20000, 26000) && col("y").between(50000, 56000))
      .select("id", "x", "y").as[(Long, Long, Long)].collect().toSet
    val expected = df
      .filter(col("x").between(20000, 26000) && col("y").between(50000, 56000))
      .select("id", "x", "y").as[(Long, Long, Long)].collect().toSet
    assert(boxed === expected && boxed.nonEmpty)
  }

  test("z-order skipping manifests in Spark's REAL reader: scan row metrics match the bounds prediction") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_scan").toString
    Layout.writeZOrdered(uniform2d, s"$dir/zorder", "x", "y", numFiles = 32)

    // rows-in-overlapping-files per the file bounds — the prediction
    // `skippableFiles` makes — for a given box
    def predictedRows(x1: Long, x2: Long, y1: Long, y2: Long): Long =
      spark.read.parquet(s"$dir/zorder")
        .groupBy(input_file_name().as("_f"))
        .agg(count(lit(1)).as("_n"),
          min(col("x")).as("_xlo"), max(col("x")).as("_xhi"),
          min(col("y")).as("_ylo"), max(col("y")).as("_yhi"))
        .filter(col("_xhi") >= x1 && col("_xlo") <= x2 &&
          col("_yhi") >= y1 && col("_ylo") <= y2)
        .agg(coalesce(sum(col("_n")), lit(0L))).head().getLong(0)

    // rows Spark's parquet scan actually PRODUCES after row-group pruning
    // (each written file is a single row group here), read from the scan
    // node's own metrics — this ties the statistics claim to the reader.
    // Filter literals are LONGs like the columns: a double literal wraps
    // the column in a cast and the bounds never reach PushedFilters.
    def scannedRows(x1: Long, x2: Long, y1: Long, y2: Long): Long = {
      val df = spark.read.parquet(s"$dir/zorder")
        .filter(col("x").between(x1, x2) && col("y").between(y1, y2))
      df.collect()
      val scans = PlanScans.fileScans(df.queryExecution.executedPlan)
      assert(scans.nonEmpty, s"no file scan in:\n${df.queryExecution.executedPlan}")
      scans.map(_.metrics("numOutputRows").value).sum
    }

    // x-slice (6% of the x range, y unconstrained) and a small both-dim box
    for ((x1, x2, y1, y2) <- Seq(
      (10000L, 16000L, 0L, 99999L),      // x-slice
      (20000L, 26000L, 50000L, 56000L))) // small box
    {
      val predicted = predictedRows(x1, x2, y1, y2)
      val scanned = scannedRows(x1, x2, y1, y2)
      // the reader can never read fewer rows than the surviving files
      // hold minus what page-level stats could further trim — and must
      // not read MORE than the bounds prediction: if parquet row-group
      // pruning didn't fire, scanned would be the full 100k
      assert(scanned <= predicted,
        s"box($x1,$x2,$y1,$y2): scan produced $scanned rows > bounds-predicted $predicted")
      assert(scanned < 100000L / 2,
        s"box($x1,$x2,$y1,$y2): scan produced $scanned rows — no real skipping")
    }
  }

  test("writeZOrdered plan: map-side key, one range exchange, no extra shuffle") {
    val df = uniform2d
    val r = df.agg(min(col("x").cast("double")), max(col("x").cast("double")),
      min(col("y").cast("double")), max(col("y").cast("double"))).head()
    val keyed = df.withColumn("_zkey",
      Layout.zorderKey(col("x"), r.getDouble(0), r.getDouble(1),
        col("y"), r.getDouble(2), r.getDouble(3)))
      .repartitionByRange(32, col("_zkey"))
      .sortWithinPartitions("_zkey")
    val p = keyed.queryExecution.executedPlan.toString
    assert("Exchange rangepartitioning".r.findAllIn(p).length === 1, s"one range exchange:\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"no hash shuffle:\n$p")
  }
}
