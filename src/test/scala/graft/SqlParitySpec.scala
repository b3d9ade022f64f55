package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** SQL DUAL-EXECUTION PARITY GATE (r18 VERDICT ask #2): every oracle in
  * `SparkEntry.oracleSql` is ANSI SQL the driver runs through DuckDB —
  * this spec runs each one through the ENGINE's OWN `spark.sql` against
  * the registered fixture views and asserts the result equals the
  * registered DataFrame pipeline's, pinning DataFrame-vs-SQL-surface
  * parity across the whole query surface (the reference's U1 registry
  * analogue for a SQL entry point).
  *
  * Five mechanical, semantics-preserving dialect rewrites are applied
  * before `spark.sql` (each is pure syntax — the plan semantics are
  * identical):
  *   - `AS MATERIALIZED` → `AS` (a DuckDB planner hint);
  *   - `FILTER (cond)` → `FILTER (WHERE cond)` (ANSI spelling);
  *   - `strftime(ts, '%…')` → `date_format(ts, '…')` with the format
  *     token map %Y→yyyy, %m→MM, %d→dd, %H→HH, %M→mm, %S→ss, scoped
  *     to format literals (a `%d` in a LIKE pattern must not rewrite);
  *   - `make_timestamp(us)` → `timestamp_micros(us)` (the µs-instant
  *     constructors);
  *   - `f(x IGNORE NULLS) OVER` → `f(x) IGNORE NULLS OVER` for
  *     first_value/last_value (placement differs, semantics don't).
  *
  * The former 26-oracle epoch_ns/`//` skip family was rewritten (r20)
  * in portable epoch-µs arithmetic — `date_diff('microsecond', epoch,
  * ts)` time keys and %-subtraction truncation — and now runs in the
  * parity set with hash-identical DuckDB results. Oracles written in
  * genuinely DuckDB-specific SQL (list lambdas, unnest-with-alias,
  * recursive enumeration, typed `[]` literals…) are NAMED in `skips`
  * with the blocking construct, and the skip itself is asserted real: a
  * skip-listed oracle that starts parsing in Spark fails its test,
  * forcing the list to shrink as the surfaces converge.
  */
class SqlParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = sys.env.getOrElse("GRAFT_SQL_PARITY_SF",
    "/root/testdata/sf0.001")

  /** The fixture views, registered exactly as DuckDB sees them — raw
    * parquet, except `events`, which surfaces the SAME normalized µs
    * `ts` both engines key on (Tables.events' nanos adaptation).
    */
  private lazy val ready: Boolean = {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      graft.sources.Tables.tbl(spark, dir, t).createOrReplaceTempView(t)
    graft.sources.Tables.events(spark, dir).withColumnRenamed("t", "ts")
      .createOrReplaceTempView("events")
    true
  }

  private val strftimeTokens = Seq("%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss")

  // strftime %-tokens are rewritten ONLY inside single-quoted literals
  // that are pure format strings (tokens + the separators - : space) —
  // a global replace would silently rewrite a future oracle's LIKE
  // pattern or data literal containing e.g. '%d', manufacturing or
  // masking a divergence. Any %-token left OUTSIDE such a literal is
  // asserted absent: loud failure instead of a silent rewrite.
  private val strftimeFmtLiteral = "'((?:%[YmdHMS]|[-: ])+)'".r

  private def sparkize(sql: String): String = {
    var s = sql
      .replace(" AS MATERIALIZED", " AS")
      .replaceAll("FILTER \\((?!WHERE)", "FILTER (WHERE ")
      .replace("strftime(", "date_format(")
      .replace("AS VARCHAR)", "AS STRING)")
      .replaceAll("date_diff\\('(\\w+)',", "date_diff($1,")
      // DuckDB's µs-instant constructor ↔ Spark's (no oracle uses the
      // multi-arg calendar form of make_timestamp)
      .replace("make_timestamp(", "timestamp_micros(")
      // DuckDB spells IGNORE NULLS inside the window-function call,
      // Spark outside it
      .replaceAll("(first_value|last_value)\\(([^()]+) IGNORE NULLS\\)",
        "$1($2) IGNORE NULLS")
    s = strftimeFmtLiteral.replaceAllIn(s, m => {
      var f = m.group(1)
      for ((d, j) <- strftimeTokens) f = f.replace(d, j)
      scala.util.matching.Regex.quoteReplacement(s"'$f'")
    })
    for ((d, _) <- strftimeTokens)
      assert(!s.contains(d),
        s"sparkize: strftime token $d outside a recognized format literal — " +
          s"scope the rewrite before running this oracle through spark.sql:\n$s")
    s
  }

  private def cellStr(v: Any): String = v match {
    case null => "∅"
    case a: scala.collection.Seq[_] => a.map(cellStr).mkString("[", ",", "]")
    case x => x.toString
  }

  private def canon(df: DataFrame): (Seq[String], Seq[Seq[String]]) = {
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(cellStr)).toSeq
      // delimited sort key ("ab","c" vs "a","bc" must not collide)
      .sortBy(_.mkString("\u0001"))
    (cols, rows)
  }

  /** name → the DuckDB-specific construct that blocks `spark.sql`. */
  private val skips: Map[String, String] = SqlParitySpec.skips
  private val divergent: Map[String, String] = SqlParitySpec.divergent
  private val executionSkips: Map[String, String] = SqlParitySpec.executionSkips

  private val oracleNames = SparkEntry.oracleSql.keys.toSeq.sorted

  if (sys.env.contains("GRAFT_SQL_PARITY_EXPLORE")) {
    // dev mode: one sweeping test that CLASSIFIES every oracle instead
    // of asserting — the output is the data the skip list is built from
    test("explore: classify every oracle under spark.sql") {
      assert(ready)
      for (name <- oracleNames) {
        val sql = sparkize(SparkEntry.oracleSql(name))
        val status =
          try {
            val got = canon(spark.sql(sql))
            val want = canon(SparkEntry.queries(name)(spark, dir))
            if (got == want) "MATCH"
            else if (got._1 != want._1) s"SCHEMA got=${got._1} want=${want._1}"
            else "MISMATCH"
          } catch { case e: Throwable =>
            "ERR " + Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString.take(160)
          }
        println(s"[sqlparity] $name\t$status")
      }
    }
  } else {
    for (name <- oracleNames) (skips.get(name), divergent.get(name)) match {
      case (Some(reason), _) =>
        test(s"sql-parity skip is real: $name [$reason]") {
          assert(ready)
          // the skip must stay justified: the oracle text (post-rewrite)
          // must still be un-runnable by Spark SQL
          intercept[Throwable] {
            spark.sql(sparkize(SparkEntry.oracleSql(name))).collect(): Unit
          }
        }
      case (None, _) if executionSkips.contains(name) =>
        test(s"sql-parity execution skip analyzes: $name [${executionSkips(name)}]") {
          assert(ready)
          // analysis-level only — see executionSkips' doc
          spark.sql(sparkize(SparkEntry.oracleSql(name))).queryExecution
            .analyzed: Unit
        }
      case (None, Some(reason)) =>
        test(s"sql-parity dialect divergence is real: $name [$reason]") {
          assert(ready)
          // runs under spark.sql but the dialect semantics differ — the
          // divergence must stay real: if the surfaces start agreeing,
          // this fails and the name moves to the parity set
          val viaSql = canon(spark.sql(sparkize(SparkEntry.oracleSql(name))))
          val viaDf = canon(SparkEntry.queries(name)(spark, dir))
          assert(viaSql !== viaDf,
            "documented divergence closed — move to the parity set")
        }
      case (None, None) =>
        test(s"sql parity: $name") {
          assert(ready)
          val viaSql = canon(spark.sql(sparkize(SparkEntry.oracleSql(name))))
          val viaDf = canon(SparkEntry.queries(name)(spark, dir))
          assert(viaSql._1 === viaDf._1, "column sets differ")
          assert(viaSql._2 === viaDf._2, "result rows differ")
        }
    }
  }
}

object SqlParitySpec {
  /** The named DuckDB-specific skip list — see the class doc. Grouped
    * by the blocking construct; generated from a full classification
    * sweep (GRAFT_SQL_PARITY_EXPLORE) over the round-19 surface and
    * kept honest by the per-skip "still un-runnable" assertion.
    */
  private[graft] val skips: Map[String, String] = Seq(
    // 1 oracles: dialect CAST semantics diverge at runtime
    "dialect CAST semantics diverge at runtime" -> Seq(
      "q_dedup_exact",
    ),
    // 4 oracles: unrolled CTE chain exceeds Spark analyzer limits
    "unrolled CTE chain exceeds Spark analyzer resolution iterations" -> Seq(
      "q_whiten", "q_whiten_streamed",
      "q_embed_pca_k", "q_embed_pca_k_streamed",
    ),
    // (r20: the 26-oracle epoch_ns/`//` family was rewritten in portable
    // epoch-µs arithmetic — date_diff('microsecond') time keys, %-based
    // integer truncation — and moved into the parity set)
    // 120 oracles: DuckDB list lambdas (list_filter/list_transform/list_reduce/len)
    "DuckDB list lambdas (list_filter/list_transform/list_reduce/len)" -> Seq(
      "q_ann_eval", "q_ann_ivf", "q_ann_ivf_trained",
      "q_ann_ivfpq", "q_ann_nn", "q_ann_nn_mp",
      "q_ann_opq", "q_ann_pq", "q_bigram_lm",
      "q_bloom_decontaminate", "q_bloom_decontaminate_streamed", "q_bm25",
      "q_bpe_encode", "q_bpe_sweep", "q_bpe_train",
      "q_bpe_train_streamed", "q_chunks", "q_clip_dedup",
      "q_communities", "q_containment", "q_corpus_card",
      "q_corpus_card_streamed", "q_curriculum", "q_decontaminate",
      "q_dedup_near", "q_dedup_sweep", "q_dedup_sweep_streamed",
      "q_docs_asof", "q_dsir", "q_dsir_streamed",
      "q_embed_drift", "q_embed_dup", "q_embed_dup_streamed",
      "q_entropy", "q_entropy_streamed", "q_export_manifest", "q_fertility",
      "q_fingerprint", "q_frame_sample", "q_fuzzy_urls",
      "q_fuzzy_urls_streamed", "q_gram_topk", "q_gram_topk_streamed",
      "q_group_percentiles", "q_group_percentiles_streamed", "q_hapax",
      "q_hapax_streamed", "q_hard_negatives", "q_hits_docs",
      "q_hybrid", "q_img_dedup", "q_index_stats",
      "q_index_stats_streamed", "q_int8_quant", "q_jaccard_mindiverge",
      "q_jaccard_pairs", "q_knn_join", "q_lang_id",
      "q_lang_id_streamed", "q_line_dedup", "q_line_dedup_streamed",
      "q_lm_score", "q_margin_pairs", "q_margin_pairs_streamed",
      "q_mirror_pairs", "q_mirror_pairs_streamed", "q_mixture",
      "q_mixture_streamed", "q_mmr", "q_modularity",
      "q_near", "q_novelty", "q_novelty_streamed",
      "q_pack", "q_pack_streamed", "q_pagerank_docs",
      "q_pagerank_docs_streamed", "q_phrase", "q_pii_scan",
      "q_pii_scan_streamed", "q_pmi", "q_pmi_streamed",
      "q_ppl", "q_ppl_streamed", "q_ppl_buckets",
      "q_ppl_buckets_streamed", "q_quality",
      "q_quality_clf", "q_quality_clf_eval", "q_quality_clf_streamed",
      "q_quality_ft", "q_quality_ft_streamed",
      "q_quality_gate", "q_quality_gate_streamed", "q_quality_streamed",
      "q_rag_chunks", "q_rag_chunks_streamed", "q_repetition",
      "q_resize", "q_rolling_fp", "q_scaling_subsets",
      "q_semdedup", "q_semdedup_streamed", "q_semdedup_whitened",
      "q_semdedup_whitened_streamed", "q_sim_topk", "q_simhash",
      "q_simhash_pairs", "q_source_drift", "q_source_drift_streamed",
      "q_source_overlap", "q_span_dups", "q_span_dups_streamed",
      "q_sparse_sim", "q_textrank", "q_textrank_streamed",
      "q_token_bpe", "q_token_count", "q_url_canon",
      "q_url_canon_streamed", "q_validate_docs", "q_validate_docs_streamed",
    ),
    // 1 oracles: DuckDB PIVOT double-quoted IN list
    "DuckDB PIVOT double-quoted IN list" -> Seq(
      "q_pivot",
    ),
    // 3 oracles: DuckDB quantile_cont/quantile_disc
    "DuckDB quantile_cont/quantile_disc" -> Seq(
      "q_mad", "q_percentiles", "q_winsorized",
    ),
    // 16 oracles: recursive CTE uses UNION (unsupported by Spark recursive CTEs)
    "recursive CTE uses UNION (unsupported by Spark recursive CTEs)" -> Seq(
      "q_bfs", "q_bfs_docs", "q_bfs_streamed",
      "q_cluster_sizes", "q_curate", "q_curate_streamed",
      "q_dedup_clusters", "q_dup_weights", "q_unigram_encode",
      "q_unigram_prune", "q_unigram_prune_encode", "q_unigram_sweep",
      "q_unigram_train", "q_url_clusters", "q_yield",
      "q_yield_streamed",
    ),
    // 1 oracles: DuckDB starts_with/encode signatures
    "DuckDB starts_with/encode signatures" -> Seq(
      "q_binary_stats",
    ),
    // 3 oracles: DuckDB time_bucket
    "DuckDB time_bucket" -> Seq(
      "q_events_enriched", "q_events_sliding", "q_events_window",
    ),
    // 24 oracles: DuckDB unnest table function
    "DuckDB unnest table function" -> Seq(
      "q_bool_and", "q_bool_not", "q_bool_or",
      "q_cms_watchlist", "q_cms_watchlist_streamed", "q_doc_freq",
      "q_gapfill", "q_gapfill_streamed", "q_heavy_hitters",
      "q_heavy_hitters_streamed", "q_postings", "q_prefix_terms",
      "q_ranked_search", "q_salted_df", "q_term_fuzzy",
      "q_term_lookup", "q_term_lookup_streamed", "q_tf",
      "q_tfidf", "q_top_terms_per_source", "q_top_terms_per_source_streamed",
      "q_topk_df", "q_vocab_hll", "q_vocab_hll_streamed",
    ),
  ).flatMap { case (reason, names) => names.map(_ -> reason) }.toMap

  /** Oracles that RUN under spark.sql but return different results —
    * pinned dialect-semantics divergences, each asserted real (a
    * divergence that closes must move to the parity set):
    *   - the audio PCM pair reads CHAR positions where both the engine
    *     and DuckDB agree on BYTES (ascii/substr over non-ASCII text);
    *   - the props-JSON pair's regex literal `\\s` is consumed by
    *     Spark's string-literal escaping (DuckDB keeps the backslash).
    */
  private[graft] val divergent: Map[String, String] = Map(
    "q_audio_stats" -> "char-vs-byte ascii/substr semantics",
    "q_audio_segments" -> "char-vs-byte ascii/substr semantics",
    "q_props_extract" -> "string-literal backslash escaping eats regex \\s",
    "q_not_in" -> "string-literal backslash escaping eats regex \\s",
  )

  /** Oracles that ANALYZE under spark.sql but fail at EXECUTION (stage
    * materialization dies on the 64-dim unrolled Gramian CTE chain).
    * Asserted at the analysis level only — executing them to prove the
    * failure costs ~2 min of failing stages each, every CI run.
    */
  private[graft] val executionSkips: Map[String, String] = Map(
    "q_embed_pca" -> "64-wide unrolled Gramian chain fails Spark stage materialization",
    "q_embed_pca_streamed" -> "64-wide unrolled Gramian chain fails Spark stage materialization",
  )
}
