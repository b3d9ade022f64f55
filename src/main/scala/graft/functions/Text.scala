package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-normalization column pipeline.
  *
  * Reproduces the reference tokenizer semantics (reference:
  * `mapper/src/processor.py:163-169`): lowercase, strip every char outside
  * `[a-z\s]`, whitespace-split, drop NLTK English stopwords, then per-document
  * distinct (`mapper/src/processor.py:190`). Everything is built from
  * `org.apache.spark.sql.functions` so the whole pipeline stays inside
  * whole-stage codegen — no UDFs.
  */
object Text {

  /** NLTK English stopword list (179 words), vendored verbatim so the engine
    * does not depend on an NLTK runtime (reference loads it at worker init,
    * `mapper/src/processor.py:23-32`). Note Spark ML's `StopWordsRemover`
    * default list differs — do not substitute it (SURVEY §7.3).
    */
  val NltkStopwords: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't")

  /** The stopwords a `[a-z]+`-only tokenizer can actually produce — the
    * apostrophe entries above can never match a token after normalization
    * (the same is true in the reference). This is the effective filter set
    * and the one embedded in DuckDB oracle SQL.
    */
  val EffectiveStopwords: Seq[String] =
    NltkStopwords.filter(_.forall(c => c >= 'a' && c <= 'z'))

  /** Lowercase + strip non-`[a-z\s]` (P1). `rock-band` → `rockband`,
    * matching the reference's char-drop (not char-to-space) semantics.
    */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z\\s]", "")

  /** P1: normalize then whitespace-tokenize; empty tokens from leading
    * whitespace are dropped (Python's arg-less `str.split()` contract).
    */
  def tokenize(text: Column): Column =
    filter(split(normalize(text), "\\s+"), t => t =!= "")

  /** F1+D1: stopword-filter and dedupe in one pass. `array_except` both
    * removes the stopword set and returns distinct elements (first-occurrence
    * order), which is exactly the reference's `set(terms)` minus stopwords.
    */
  def terms(text: Column): Column =
    array_except(tokenize(text), lit(EffectiveStopwords.toArray))

  /** Tokens with stopwords removed but duplicates KEPT — the term-frequency
    * carrying variant used by tf-idf and quality scoring (the reference
    * discards tf by design; this is an ⊕ extension input).
    */
  def tokensNoStop(text: Column): Column =
    filter(tokenize(text), t => !t.isin(EffectiveStopwords: _*))

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token array column,
    * e.g. n=3 → `"a b c"` strings. Used by MinHash / n-gram-Jaccard dedup.
    * Computed by the native `word_shingles` expression (one generated
    * loop); the column formulation below is the cross-check oracle.
    *
    * Take tokens as an attribute (project `tokenize(text)` first), not an
    * expression: Catalyst does not CSE inside lambda bodies, so passing
    * `tokenize(text)` directly would re-run the regex+split pipeline once
    * per shingle position per row.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    graft.plans.WordShingles.wordShingles(toks, n)

  /** Pre-round-3 pure-column formulation of `shinglesFromTokens` — two
    * CodegenFallback lambda traversals with a sliced array per position.
    * Kept as the independent cross-check for `word_shingles`
    * (DedupProperties asserts bit-identical output).
    */
  private[graft] def shinglesFromTokensViaColumns(toks: Column, n: Int): Column =
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))), i =>
        when(size(toks) >= n,
          concat_ws(" ", slice(toks, i + 1, lit(n)))).otherwise(lit(null))),
      s => s.isNotNull)

  /** Convenience single-expression form — ONLY for tiny inputs/tests; hot
    * paths must project `tokenize` first and use `shinglesFromTokens`.
    */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokenize(text), n)
}
