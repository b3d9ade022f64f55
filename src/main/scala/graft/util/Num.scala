package graft.util

/** The cross-engine numeric grid in ONE place. */
object Num {

  /** Half-up quantization to the 6dp grid — the SQL `round(x, 6)` every
    * DuckDB oracle mirrors. This is the determinism contract of every
    * iterative trainer (Lloyd, PageRank, Pca deflation, the logistic
    * trainer, unigram EM): one shared implementation so the rounding
    * mode cannot silently drift per operator and break oracle parity
    * for just one of them.
    */
  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
