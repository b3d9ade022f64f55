package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.InvertedIndex
import graft.queries._
import graft.sources.Corpus

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's registered operator surface (reference U1 —
  * the name-keyed function registry, `mapper/src/available_functions.py:5-19`
  * — generalized to a name → DataFrame-pipeline map). `oracleSql` carries a
  * DuckDB-equivalent per query for the driver's correctness gate.
  */
object SparkEntry {

  /** Flagship: build the inverted index over the sf0.001 corpus and look up
    * the posting list for one term — the reference's end-to-end job + its
    * natural point query.
    */
  def entry(spark: SparkSession): DataFrame =
    InvertedIndex.lookup(
      InvertedIndex.postings(Corpus.documents(spark, "/root/testdata/sf0.001")),
      "spark")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TextQueries.queries ++ RelationalQueries.queries ++
      RelationalQueries.queriesExtra ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      AnalysisQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    TextQueries.oracles ++ RelationalQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++
      AnalysisQueries.oracles
}
