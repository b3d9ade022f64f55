package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-Pair-Encoding MERGE-RULE TRAINING — the tokenizer-learning pass
  * a training-data pipeline runs after curation (Sennrich et al. '16;
  * the modern counterpart of the reference's tokenizer, its core
  * data-plane op — reference: `mapper/src/processor.py:163-168`).
  * `q_token_bpe` COUNTS byte pairs under a fixed toy vocabulary; this
  * operator LEARNS the vocabulary: N rounds of corpus-wide pair
  * frequency → rank-1 merge applied map-side.
  *
  * SCALE SHAPE: the corpus-proportional work happens ONCE — the word-
  * frequency aggregation (map-side partial count, one exchange). Every
  * training round then runs over the VOCAB-SIZED (word, wc, syms)
  * state: pair extraction is a map-side `zip_with` + explode, the pair
  * count is one vocab-sized exchange (the `q_gram_topk` aggregation
  * shape), the winning rule is a 1-row bounded driver lift, and the
  * merge application is a pure map-side fold — no corpus re-scan, no
  * growing state, N rounds = N vocab-sized shuffles. Per-round state is
  * persisted (and the previous round released) so round r+1's action
  * does not re-execute rounds 1..r.
  *
  * DETERMINISM: the winning pair is max count with lexicographic
  * (left, right) tie-break — a total order, so the learned merge table
  * is identical under any partitioning (BpeSpec pins this under
  * repartition). The greedy left-to-right merge is a left FOLD over the
  * symbol array: `[last(acc)=L ∧ x=R] → replace last with LR, else
  * append x`. The fold equals the classic two-pointer scan: an
  * overlapping match needs sym[i+1] to be both R (first match) and L
  * (second match), so conflicts only arise in same-symbol runs, where
  * the fold's just-merged tail `LR ≠ L` (R is non-empty) makes it keep
  * exactly the odd-indexed matches of the run — the scan's choice.
  */
object Bpe {

  /** One word as its character-symbol array — explicit `substring`
    * positions, not `split(w, "")`, so the symbol alphabet is exactly
    * the word's characters on every engine. The empty word is guarded
    * explicitly: `sequence(1, 0)` defaults its step to -1 and yields
    * `[1, 0]`, which would silently turn '' into TWO empty-string
    * symbols — tokenize's no-empty-token contract makes the branch
    * unreachable from the registered queries, but the operator must be
    * correct for any caller.
    */
  def charSyms(word: Column): Column =
    when(length(word) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))))

  /** Greedy left-to-right application of merge rule (l, r) to a symbol
    * array, as a map-side fold (see object doc for the fold ≡ scan
    * argument). Stays a pure column expression — no UDF.
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** ENCODE a word under an ordered learned merge list: apply each
    * rule's greedy fold in training order to the character split. Per
    * word this is exactly the sequence of transformations the training
    * state went through, so for any word in the training corpus the
    * encoded symbols equal the final training state's row set for that
    * word — which is what lets the oracle read the encode answer
    * straight off its unrolled round-8 state table.
    */
  def encodeSyms(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSyms(word)) { case (c, (l, r)) => applyMerge(c, l, r) }

  /** Train `rounds` BPE merge rules over a (word, wc) word-frequency
    * relation. Returns the learned merge table: one row per round —
    * (round, left, right, merged, pair_count) — fewer rows if the pair
    * mass dries up first. The per-round argmax is a 1-row driver lift,
    * bounded by contract (it IS the training loop's control flow, the
    * same driver role as `Similarity.lloydIters`' centroid lift).
    */
  def train(words: DataFrame, rounds: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    var state = words.select(col("word"), col("wc").cast("long").as("wc"))
      .withColumn("syms", charSyms(col("word")))
      .persist()
    // the round's argmax action is ALSO what materializes the round's
    // persisted state (from the parent's cache) — the parent is released
    // only afterwards, so no extra count() pass per round
    var parent: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    try {
      var round = 1
      var dry = false
      while (round <= rounds && !dry) {
        val best = state
          .select(col("wc"), explode(zip_with(
            // greatest(…, 0): a 0-symbol state row (the guarded empty
            // word) must yield no pairs, not a negative slice length
            slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
            slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("wc")).as("n"))
          .orderBy(col("n").desc, col("l"), col("r"))
          .limit(1)
          .collect()
        parent.foreach(_.unpersist()) // state is materialized now
        parent = None
        best.headOption match {
          case None => dry = true
          case Some(row) =>
            val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
            merges += ((round, l, r, l + r, n))
            parent = Some(state)
            state = state
              .withColumn("syms", applyMerge(col("syms"), l, r))
              .persist()
            round += 1
        }
      }
    } finally { parent.foreach(_.unpersist()); state.unpersist(): Unit }
    merges.toSeq.toDF("round", "left", "right", "merged", "pair_count")
      .select(col("round").cast("long").as("round"), col("left"), col("right"),
        col("merged"), col("pair_count"))
  }
}
