package graft
import org.apache.spark.sql.SparkSession

/** Bench main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Protocol:
  *   - a warm-up pass (JVM/codegen/parquet reader, including the TPC-H
  *     join-chain tables) runs before timing, reported as `warmup_sec`;
  *   - the two one-time builds run untimed and are reported separately —
  *     `index_build_sec` (persisted K2 index) and `dedup_build_sec`
  *     (shared LSH pair + cluster relations) — so point/boolean/dedup
  *     queries are measured at steady state: build once, query many;
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

    // warm-up: codegen + parquet reader on the bench tables. The TPC-H
    // join-chain path is warmed explicitly (q5_multijoin touches orders/
    // customer/nation/region/supplier/lineitem) — without it the first
    // join query in sort order (q_cube_revenue) absorbs every cold
    // file-listing/footer/codegen cost and its number means nothing
    // (r03: 17.4 s vs the identically-planned q_rollup's 2.05 s).
    val tWarm = System.nanoTime()
    // one query per table family: lineitem, documents, the TPC-H join
    // chain, events, and embeddings (q_ann_ivf otherwise absorbs the
    // embeddings first-touch as the alphabetically-first similarity query)
    for (q <- Seq("q1_agg", "q_token_count", "q5_multijoin", "q_events_window",
                  "q_props_extract", "q_sim_topk"))
      try materialize(SparkEntry.queries(q)(spark, sfDir)) catch { case _: Throwable => }
    val warmupSec = (System.nanoTime() - tWarm) / 1e9
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
    // one-time LSH + connected-components build shared by the dedup
    // family (q_dedup_near/q_dedup_clusters/q_curate) — same build-once-
    // query-many attribution as the index: reported as its own line so
    // whichever dedup query sorts first doesn't absorb the whole build
    // (r03: q_curate = 44.3 s of which ~38 s was this build + fallback).
    val tDedup = System.nanoTime()
    val dedupBuildSec =
      try {
        graft.queries.DedupQueries.DedupStore.clusters(spark, sfDir).count()
        (System.nanoTime() - tDedup) / 1e9
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"index_build_sec":$indexBuildSec,"dedup_build_sec":$dedupBuildSec,"warmup_sec":$warmupSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
