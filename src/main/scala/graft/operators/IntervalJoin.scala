package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** INTERVAL OVERLAP JOIN — the co-activity / resource-contention /
  * time-overlap shape Spark has no native plan for (extracted from the
  * q_interval_join body per the r16 VERDICT: the banding pattern is
  * reusable for any interval relation and the band width is a caller
  * decision, not a constant).
  *
  * SCALE PATH — TIME BANDING: each interval explodes the `bandUs`-wide
  * buckets it touches, candidates come from ONE bucket-keyed EQUI-join
  * (AQE-splittable; a peak-hour bucket is a hot hash key, never a
  * window), the exact strict-overlap predicate verifies candidates
  * only, and bucket-duplicate pairs collapse (`distinct`) before
  * anything downstream — never the all-pairs non-equi join (BNL,
  * quadratic in interval count) a naive `a.start < b.end` formulation
  * plans.
  *
  * FAN CONTRACT: an interval spanning n buckets contributes n candidate
  * rows per overlapping partner — the explode is bounded by
  * ⌈length/bandUs⌉ + 1 per interval. Pick `bandUs` near the TYPICAL
  * interval length: too small explodes long intervals, too large makes
  * every bucket a dense candidate cell. An interval wider than
  * `maxBuckets` bands (default 2²⁰) fails LOUDLY (`raise_error`) rather
  * than silently exploding a task — the caller either widens the band
  * or raises the cap deliberately.
  *
  * Input: (owner, iid, s_us, e_us) — strictly positive-length intervals
  * (e_us > s_us) keyed by owner; zero-length intervals are excluded by
  * contract (they overlap nothing under the strict predicate).
  * Output: one row per overlapping cross-owner pair, canonicalized
  * owner_a < owner_b, with both intervals' bounds.
  */
object IntervalJoin {

  def overlapPairs(intervals: DataFrame, bandUs: Long,
                   maxBuckets: Long = 1L << 20): DataFrame = {
    require(bandUs > 0, "bandUs must be positive")
    val nb: Column =
      expr(s"e_us div $bandUs") - expr(s"s_us div $bandUs") + 1
    val banded = intervals
      .select(col("owner"), col("iid"), col("s_us"), col("e_us"),
        // exact integer division: a double `/` could land a boundary
        // timestamp in the wrong bucket and silently drop a candidate
        explode(sequence(expr(s"s_us div $bandUs"),
          // the fan guard rides the explode bound itself so an
          // out-of-contract interval can never materialize its buckets
          when(nb > maxBuckets, raise_error(concat(
            lit(s"interval fan contract: interval spans "), nb,
            lit(s" > $maxBuckets bands of $bandUs us — widen bandUs or raise maxBuckets"))))
            .otherwise(expr(s"e_us div $bandUs"))))
          .as("hb"))
    val a = banded.select(col("hb"), col("owner").as("owner_a"),
      col("iid").as("iid_a"), col("s_us").as("sa"), col("e_us").as("ea"))
    val b = banded.select(col("hb"), col("owner").as("owner_b"),
      col("iid").as("iid_b"), col("s_us").as("sb"), col("e_us").as("eb"))
    a.join(b, Seq("hb"))
      .filter(col("owner_a") < col("owner_b") &&
        col("sa") < col("eb") && col("sb") < col("ea"))
      .select("owner_a", "iid_a", "owner_b", "iid_b", "sa", "ea", "sb", "eb")
      .distinct() // a pair sharing several bands matches once
  }
}
