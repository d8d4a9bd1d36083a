package graft.ops

/** Shared numeric pinning helpers. */
object Num {

  /** Round HALF_UP at 9 decimals — THE determinism pin that makes an
    * iterative trajectory (Bradley–Terry MM, Elo, PAV means, AUC)
    * bit-reproducible and replayable by a DuckDB oracle's
    * `round(x, 9)`: both engines land on the double nearest the same
    * 9-decimal value. Every op that documents "round(9)-pinned" must
    * use THIS helper — a second copy drifting to another rounding
    * mode would silently break oracle parity.
    */
  def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
}
