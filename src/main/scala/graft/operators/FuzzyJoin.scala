package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching via SymSpell deletion-neighborhood blocking
  * (Garbe's spell-correction index, generalized to a distributed
  * similarity join). The blocking invariant: two strings are within
  * edit distance 1 iff their {identity} ∪ {1-deletion} variant sets
  * intersect —
  *   - substitution: both sides share the deletion at the edited slot;
  *   - insertion/deletion (lengths n, n+1): the shorter string IS a
  *     1-deletion of the longer, so it matches the longer's variant via
  *     its OWN identity variant.
  * The identity (distance-0) variant is load-bearing: deletions alone
  * have length n−1 vs n and can never collide across a length gap, so
  * a deletions-only block silently drops every pure insert/delete pair
  * (trailing-slash URL twins, the most common crawl-frontier near-dup).
  *
  * Sharing a variant bounds ED ≤ 2 from above (e.g. "ab"/"ba" share
  * both deletions at ED 2), so a final `levenshtein` check filters the
  * survivors — it runs on candidates only, never all pairs. Variant
  * fan-out is |s|+1 per string, so the equi-join on variants stays
  * flat-fan at any corpus size; no all-pairs pass anywhere.
  */
object FuzzyJoin {

  /** The {identity} ∪ {1-deletion} variant array for a string column. */
  def variants(c: Column): Column =
    concat(
      array(c),
      transform(sequence(lit(1), length(c)), i =>
        concat(c.substr(lit(1), i - lit(1)), c.substr(i + lit(1), length(c)))))

  /** Driver-side twin of [[variants]] for a literal query string —
    * used to block a single probe term against a dictionary without
    * exploding the probe side into a DataFrame.
    */
  def variantsOf(s: String): Seq[String] =
    s +: s.indices.map(i => s.substring(0, i) + s.substring(i + 1))

  /** Dictionary probe: the distinct values of `dict.col(c)` within
    * edit distance 1 of the literal `q` (including `q` itself if
    * present). The probe's variant set is computed driver-side
    * (|q|+1 strings) and pushed as an IN filter against the exploded
    * dictionary variants; a length band [|q|−1, |q|+1] prunes the
    * dictionary before the explode (ED 1 can't bridge a 2-length gap).
    * One vocab-sized pass, candidate-only levenshtein — never a full
    * edit-distance scan of the dictionary.
    */
  def ed1Matches(dict: DataFrame, c: String, q: String): DataFrame = {
    val vs = variantsOf(q)
    dict.select(col(c))
      .filter(length(col(c)).between(q.length - 1, q.length + 1))
      .select(col(c), explode(variants(col(c))).as("v"))
      .filter(col("v").isin(vs: _*))
      .select(c).distinct()
      .filter(levenshtein(col(c), lit(q)) <= 1)
  }

  /** Self-join: all unordered pairs of `df.col(c)` values at edit
    * distance exactly 1. Input values are distinct-ed first; output is
    * (a, b) with a < b, each pair once.
    */
  def ed1Pairs(df: DataFrame, c: String, outA: String = "url_a",
               outB: String = "url_b"): DataFrame = {
    val u = df.select(col(c)).distinct()
    val dels = u.select(col(c), explode(variants(col(c))).as("v"))
    dels.select(col(c).as(outA), col("v"))
      .join(dels.select(col(c).as(outB), col("v")), "v")
      .filter(col(outA) < col(outB))
      .select(outA, outB).distinct()
      .filter(levenshtein(col(outA), col(outB)) === 1)
  }
}
