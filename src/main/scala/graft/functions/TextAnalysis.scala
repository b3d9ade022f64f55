package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation (⊕ LLM-pipeline,
  * SURVEY §2.2): language ID, quality scoring, token counting,
  * hash-sampled document fingerprints. All pure `functions._` column
  * pipelines — codegen'd, shuffle-free projections; the only aggregations
  * happen in the queries that consume them.
  *
  * Determinism: every score is plain arithmetic over token/char counts
  * (rounded at the output boundary), so each operator is reproducible in
  * DuckDB for the oracle gate.
  */
object TextAnalysis {

  /** Tiny function-word lists per language (public common words). A real
    * deployment would swap in character-n-gram profiles; the OPERATOR
    * (per-language evidence scores + argmax with deterministic tie-break)
    * is the part that matters at scale — it stays a single projection.
    */
  val FunctionWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "was", "for", "with", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "les", "et", "une", "est", "dans", "que", "pour", "qui", "pas"),
    "es" -> Seq("el", "los", "las", "y", "un", "una", "es", "por", "como", "pero"))

  /** Per-language evidence score: fraction of tokens that are function
    * words of that language (0.0 for empty docs).
    */
  def langScore(tokens: Column, words: Seq[String]): Column = {
    val hits = size(filter(tokens, t => t.isin(words: _*)))
    round(when(size(tokens) === 0, 0.0)
      .otherwise(hits.cast("double") / size(tokens)), 6)
  }

  /** Whitespace token count (stopwords kept). */
  def wsTokenCount(text: Column): Column = size(Text.tokenize(text)).cast("long")

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-space symbols — the standard pre-tokenizer shape, countable
    * without a vocab. A real BPE would follow with merges; the corpus
    * statistics (tokens/doc, tokens/char) come from this count.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Ratio of characters outside `[a-zA-Z0-9\s]` (punctuation-ish). */
  def punctRatio(text: Column): Column = {
    val stripped = regexp_replace(text, "[^a-zA-Z0-9\\s]", "")
    round(when(length(text) === 0, 0.0)
      .otherwise((length(text) - length(stripped)).cast("double") / length(text)), 6)
  }

  /** Fraction of tokens that are NLTK stopwords — high for natural prose,
    * near-zero for tables/code/gibberish.
    */
  def stopwordRatio(text: Column): Column = {
    val toks = Text.tokenize(text)
    round(when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => t.isin(Text.EffectiveStopwords: _*))).cast("double")
        / size(toks)), 6)
  }

  /** Mean token length (0.0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val toks = Text.tokenize(text)
    round(when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double")
        / size(toks)), 6)
  }

  /** Deterministic dataset split for train/val/test: bucket 0..99 from
    * the md5 of the id — engine-portable and stable across runs and
    * cluster sizes (the property random `sample()` cannot give you).
    * Four hex chars (65536 values) mod 100 keep the modulo bias ≤ 0.15%.
    */
  def hashBucket100(id: Column): Column = {
    val nibs = (1 to 4).map { i =>
      val c = ascii(substring(md5(id.cast("string")), i, 1))
      when(c <= 57, c - 48).otherwise(c - 87)
    }
    nibs.reduce((acc, n) => acc * 16 + n) % 100
  }

  /** Split label from the deterministic bucket: 80/10/10 train/val/test. */
  def splitLabel(id: Column): Column = {
    val b = hashBucket100(id)
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  /** The ONE deterministic sampling order shared by every rank-based
    * sampler (`q_sample_per_source`, `Mixing.targetMix`): md5 of the id's
    * string form, id as the total-order tie-break. Engine-portable — the
    * DuckDB oracles mirror `md5(CAST(id AS VARCHAR)), id` verbatim.
    */
  def md5RankOrder(id: Column): Seq[Column] = Seq(md5(id.cast("string")), id)

  /** Deterministic uniform in (0,1) from the id's md5: the first 8 hex
    * chars as a 32-bit value v, u = (v + 0.5) / 2^32 — half-offset so u
    * is never exactly 0 or 1 (both would break x^(1/w) sampling). Same
    * engine-portability contract as `md5RankOrder`: the DuckDB oracles
    * mirror the nibble decode verbatim.
    */
  def hashUniform(id: Column): Column = {
    val nibs = (1 to 8).map { i =>
      val c = ascii(substring(md5(id.cast("string")), i, 1))
      when(c <= 57, c - 48).otherwise(c - 87)
    }
    val v = nibs.tail.foldLeft(nibs.head.cast("long"))((acc, n) => acc * 16 + n)
    (v.cast("double") + 0.5) / lit(4294967296.0)
  }

  /** Efraimidis–Spirakis weighted-sampling priority u^(1/w): taking the
    * top-k by this key IS a weighted random sample without replacement
    * with inclusion probability proportional to w (the classic A-ES
    * result), yet fully deterministic here because u comes from
    * `hashUniform` — stable across runs, engines and cluster sizes.
    * Rounded to 6 decimals (the engine float-parity rule); callers order
    * by (priority DESC, id) so rounding collisions break identically
    * everywhere. Weights must be strictly positive.
    */
  def weightedPriority(id: Column, weight: Column): Column =
    round(pow(hashUniform(id), lit(1.0) / weight), 6)

  /** Heuristic quality score in [0,1]: one point per satisfied band,
    * equally weighted — length band, mean-token-length band, stopword
    * band, punctuation band. Deterministic integer arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val nTok = wsTokenCount(text)
    val bands =
      when(nTok.between(10, 10000), 1).otherwise(0) +
        when(meanTokenLen(text).between(2.5, 12.0), 1).otherwise(0) +
        when(stopwordRatio(text) <= 0.6, 1).otherwise(0) +
        when(punctRatio(text) <= 0.2, 1).otherwise(0)
    round(bands.cast("double") / 4, 2)
  }

  /** Gopher-style word-n-gram repetition metrics over a token array
    * (`Text.tokenize` output), the standard pre-training repetition
    * filters: `top2_frac` = character mass (count × chars) of the MOST
    * FREQUENT 2-gram / doc character total; `dup5_frac` = character mass
    * inside duplicated 5-grams / total. Masses count every OCCURRENCE —
    * a character covered by several duplicated windows is counted per
    * window, so `dup5_frac` is occurrence-inflated relative to Gopher's
    * bounded covered-character fraction and can exceed 1.0 (both engines
    * alike, by definition). Drop thresholds must be calibrated to THIS
    * definition, not copied from the Gopher paper's.
    *
    * Scale shape: `shinglesFromTokens` → `run_stats` is a pure per-row
    * projection (the expression sorts internally and counts runs,
    * replacing the per-doc histogram a groupBy(doc, gram) would SHUFFLE
    * the whole corpus for); zero exchanges, whole-stage codegen end to
    * end — `array_sort` would be a CodegenFallback lambda per comparison.
    */
  def repetitionFracs(ts: Column): (Column, Column) = {
    val total = length(concat_ws(" ", ts)).cast("long")
    def frac(chars: Column): Column =
      when(total > 0, round(chars / total, 6)).otherwise(lit(0.0))
    val top2 = graft.plans.RunStats.runStats(Text.shinglesFromTokens(ts, 2))
      .getField("top_chars")
    val dup5 = graft.plans.RunStats.runStats(Text.shinglesFromTokens(ts, 5))
      .getField("dup_chars")
    (frac(top2), frac(dup5))
  }

  /** Column-only formulation of `RunStats` over a PRE-SORTED gram array
    * (caller applies `array_sort`) — an `aggregate()` fold carrying
    * (prev, run, bestRun, top, dup). CodegenFallback lambda chain
    * allocating a struct per gram: retained ONLY as the independent
    * bit-identity cross-check for the native expression
    * (ExpressionProperties), never in a query path.
    */
  private[graft] def runStatsViaColumns(sorted: Column): Column = {
    val zero = struct(
      lit("").as("prev"), lit(0L).as("run"), lit(0L).as("bestRun"),
      lit(0L).as("top"), lit(0L).as("dup"))
    def closed(acc: Column): Column = acc.getField("run") * length(acc.getField("prev"))
    // close the open run: does it displace the current most-frequent gram?
    def better(acc: Column): Column =
      acc.getField("run") > acc.getField("bestRun") ||
        (acc.getField("run") === acc.getField("bestRun") && closed(acc) > acc.getField("top"))
    def closedBestRun(acc: Column): Column =
      when(better(acc), acc.getField("run")).otherwise(acc.getField("bestRun"))
    def closedTop(acc: Column): Column =
      when(better(acc), closed(acc)).otherwise(acc.getField("top"))
    def closedDup(acc: Column): Column =
      when(acc.getField("run") >= 2, acc.getField("dup") + closed(acc))
        .otherwise(acc.getField("dup"))
    aggregate(sorted, zero,
      (acc, x) => {
        val same = acc.getField("run") > 0 && acc.getField("prev") === x
        struct(
          x.as("prev"),
          when(same, acc.getField("run") + 1).otherwise(lit(1L)).as("run"),
          when(same, acc.getField("bestRun")).otherwise(closedBestRun(acc)).as("bestRun"),
          when(same, acc.getField("top")).otherwise(closedTop(acc)).as("top"),
          when(same, acc.getField("dup")).otherwise(closedDup(acc)).as("dup"))
      },
      acc => struct(
        closedTop(acc).as("top_chars"),
        closedDup(acc).as("dup_chars")))
  }

  /** Column-only formulation of `EntropyStats` over a PRE-SORTED token
    * array (caller applies `array_sort`) — an `aggregate()` fold carrying
    * (prev, run, dl, n_terms, s_micros). CodegenFallback lambda chain:
    * retained ONLY as the independent bit-identity cross-check for the
    * native expression (ExpressionProperties), never in a query path.
    */
  private[graft] def entropyStatsViaColumns(sorted: Column): Column = {
    val zero = struct(
      lit("").as("prev"), lit(0L).as("run"), lit(0L).as("dl"),
      lit(0L).as("nt"), lit(0L).as("sm"))
    // Math.round(ln(run)·1e6) — Spark round is HALF_UP, identical to the
    // JVM half-up for the non-negative ln(run ≥ 1)
    def micros(run: Column): Column =
      round(log(run.cast("double")) * lit(1000000.0), 0).cast("long")
    def closedNt(acc: Column): Column =
      when(acc.getField("run") > 0, acc.getField("nt") + 1)
        .otherwise(acc.getField("nt"))
    def closedSm(acc: Column): Column =
      when(acc.getField("run") > 0,
        acc.getField("sm") + acc.getField("run") * micros(acc.getField("run")))
        .otherwise(acc.getField("sm"))
    aggregate(sorted, zero,
      (acc, x) => {
        val same = acc.getField("run") > 0 && acc.getField("prev") === x
        struct(
          x.as("prev"),
          when(same, acc.getField("run") + 1).otherwise(lit(1L)).as("run"),
          (acc.getField("dl") + 1).as("dl"),
          when(same, acc.getField("nt")).otherwise(closedNt(acc)).as("nt"),
          when(same, acc.getField("sm")).otherwise(closedSm(acc)).as("sm"))
      },
      acc => struct(
        acc.getField("dl").as("dl"),
        closedNt(acc).as("n_terms"),
        closedSm(acc).as("s_micros")))
  }
}
