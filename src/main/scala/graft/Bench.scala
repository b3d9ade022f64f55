package graft
import org.apache.spark.sql.SparkSession

/** Bench main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Protocol:
  *   - a warm-up pass (JVM/codegen/parquet reader) runs before timing;
  *   - the one-time persisted-index build runs untimed and is reported
  *     separately as `index_build_sec` (point/boolean queries are then
  *     measured at steady state — build once, query many);
  *   - a failing query records its error in `errors` instead of
  *     masquerading as a fast timing;
  *   - queries run in sorted name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // keep bucketed scans on so term-bucketed index lookups bucket-prune
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) — see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // engine Catalyst extensions (hamming_hex)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    // Materialize EVERY row through the noop sink: unlike `count()`,
    // which lets Catalyst prune a projection query down to a count-only
    // scan (md5 digests, language scores etc. would never evaluate),
    // the noop write evaluates the full result with no output cost.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up: codegen + parquet reader on the bench tables
    try materialize(SparkEntry.queries("q1_agg")(spark, sfDir)) catch { case _: Throwable => }
    try materialize(SparkEntry.queries("q_token_count")(spark, sfDir)) catch { case _: Throwable => }
    // one-time index build (the K2 sink) — reported, not hidden — plus an
    // untimed bucket-pruned read so the first timed index query measures
    // the steady-state read path, not first-touch table/file-listing costs
    val tIdx = System.nanoTime()
    val indexBuildSec =
      try {
        val p = graft.sources.IndexStore.postings(spark, sfDir)
        p.count()
        // warm with a term that exists ("the" is a stopword and never
        // reaches the index) so the warm read touches real bucket data
        materialize(p.filter(org.apache.spark.sql.functions.col("term") === "spark"))
        (System.nanoTime() - tIdx) / 1e9
      } catch { case _: Throwable => -1.0 }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { materialize(fn(spark, sfDir)); None }
        catch { case e: Throwable => Some(e.toString.take(300)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => esc(k) + ":" + v }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => esc(k) + ":" + esc(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"index_build_sec":$indexBuildSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
