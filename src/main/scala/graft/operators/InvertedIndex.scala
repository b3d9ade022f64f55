package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Inverted-index construction — the reference's entire data plane
  * (S3→K2, SURVEY §2.1) as one declarative Spark pipeline.
  *
  * Scale notes (100 TB): the only shuffle is the `groupBy(term)` exchange;
  * per-document distinct (`array_except`) happens BEFORE `explode`, so the
  * shuffle carries one row per (term, doc) — the same cardinality reduction
  * the reference gets from its map-side `set()` + grouping
  * (`mapper/src/processor.py:92-99`). Partial aggregation (map-side combine)
  * is planned automatically by Catalyst (`ObjectHashAggregate` partial mode).
  * Everything before the exchange is a single whole-stage-codegen span over
  * the parquet scan, with column pruning down to (doc_id, url, text).
  */
object InvertedIndex {

  /** M1: one row per unique (term, doc) — the reference's posting record
    * `{term, doc_id, url}` (`mapper/src/processor.py:190-192`).
    */
  def postings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("url"), explode(Text.terms(col("text"))).as("term"))
      .select("term", "doc_id", "url")

  /** G1+R1+R2: full index — term → doc_id-sorted posting list. Dedupe (R3)
    * is already guaranteed by the per-doc distinct in `postings`; struct
    * sort_array orders by the first field (doc_id).
    */
  def index(docs: DataFrame): DataFrame =
    postings(docs)
      .groupBy("term")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("url")))).as("postings"))

  /** Point lookup: posting list for one term. On a persisted index, pair with
    * a term-bucketed sink (`Sinks.writeIndex`) so the scan prunes to one
    * bucket instead of shuffling the full index.
    */
  def lookup(postingsDf: DataFrame, term: String): DataFrame =
    postingsDf.filter(col("term") === term).select("doc_id", "url")

  /** Document frequency per term (size of the posting set). */
  def docFreq(postingsDf: DataFrame): DataFrame =
    postingsDf.groupBy("term").agg(count(lit(1)).as("df"))

  /** Top-k terms by document frequency, deterministic tie-break on term. */
  def topKByDocFreq(postingsDf: DataFrame, k: Int): DataFrame =
    docFreq(postingsDf).orderBy(col("df").desc, col("term")).limit(k)
}

/** Boolean multi-term queries over the posting relation (SURVEY §2.2 —
  * AND = posting-set intersection, OR = union, NOT = difference). All are
  * expressed on the flat (term, doc_id) relation so Catalyst plans them as
  * joins/aggregates with partial pushdown; the tiny per-term posting sets
  * broadcast naturally under AQE.
  */
object BooleanQuery {

  private def docsFor(postings: DataFrame, term: String): DataFrame =
    postings.filter(col("term") === term).select("doc_id").distinct()

  /** Documents containing ALL of the given terms (posting intersection). */
  def and(postings: DataFrame, terms: Seq[String]): DataFrame =
    terms.map(docsFor(postings, _)).reduce(_.intersect(_))

  /** Documents containing ANY of the given terms (posting union). */
  def or(postings: DataFrame, terms: Seq[String]): DataFrame =
    terms.map(docsFor(postings, _)).reduce(_.union(_)).distinct()

  /** Documents containing `include` but NONE of `exclude`. */
  def andNot(postings: DataFrame, include: String, exclude: Seq[String]): DataFrame =
    exclude.foldLeft(docsFor(postings, include))((acc, t) => acc.except(docsFor(postings, t)))
}
