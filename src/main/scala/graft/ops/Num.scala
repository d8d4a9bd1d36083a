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

  /** The NR erfcc fit's constants, THE single source for all three
    * evaluation forms — the scalar ([[erfcc]]), the Column expression
    * ([[erfccCol]]), and the SQL string (`SparkEntry.erfccSql`). The
    * whole p-value design rests on the three forms evaluating the
    * identical Horner chain; hand-maintained copies were a silent
    * drift surface (a digit fixed in one copy breaks cross-engine bit
    * parity with no error anywhere).
    */
  val ErfccLead: Double = -1.26551223
  val ErfccCoeffs: Seq[Double] = Seq(1.00002368, 0.37409196, 0.09678418,
    -0.18628806, 0.27886807, -1.13520398, 1.48851587, -0.82215223,
    0.17087277)

  /** Complementary error function via the Numerical Recipes rational
    * Chebyshev fit (Press et al., "Numerical Recipes in C" §6.2,
    * `erfcc`): |fractional error| < 1.2e-7 everywhere. Chosen over a
    * full-precision erfc precisely BECAUSE it is one `exp` plus a
    * fixed Horner polynomial — a closed form an ANSI-SQL oracle
    * replays operation by operation (DuckDB ships no erf/erfc), so
    * the χ²₁ p-values built on it are cross-engine reproducible under
    * the round(9) pin. The 1e-7 approximation error is immaterial to
    * the A/B decision a p-value serves; what matters is that BOTH
    * engines evaluate the SAME published formula.
    */
  def erfcc(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.5 * math.abs(x))
    // Horner right-fold over the shared coefficients: c0 + t(c1 + t(...))
    val horner = ErfccCoeffs.foldRight(0.0)((c, acc) => c + t * acc)
    val ans = t * math.exp(-x * x + ErfccLead + t * horner)
    if (x >= 0) ans else 2.0 - ans
  }

  /** Upper-tail p-value of a χ²₁-distributed statistic — McNemar's
    * test, a squared two-proportion z: p = erfc(√(stat/2)), clamped
    * at 1 (the NR fit can exceed 1 by < 1.2e-7 near stat = 0).
    */
  def chi2P1(stat: Double): Double =
    math.min(1.0, erfcc(math.sqrt(stat / 2.0)))

  /** Horner coefficients of the CLOSED-FORM upper tail of a χ²_df
    * distribution at integer df — THE single source for the scalar
    * ([[chi2P]]), Column ([[chi2PCol]]), and SQL (`SparkEntry
    * .chi2PSql`) forms, the [[ErfccCoeffs]] discipline. With
    * u = x/2 and m = ⌊df/2⌋:
    *
    *  - even df:  Q(x; df) = e^{−u} · Σ_{j=0}^{m−1} u^j / j!
    *  - odd  df:  Q(x; df) = erfc(√u) + e^{−u} · √u ·
    *                           Σ_{j=1}^{m} u^{j−1} / Γ(j + 1/2)
    *
    * (the standard recurrence Q(x; ν+2) = Q(x; ν) + u^{ν/2}e^{−u}/
    * Γ(ν/2 + 1) unrolled from Q(x; 2) = e^{−u} and Q(x; 1) =
    * erfc(√u) — an EXACT finite form at integer df, not a series
    * truncation; the only approximation anywhere is the erfc fit on
    * the odd-df base term). Returned as the Horner coefficient list
    * of the Σ polynomial in u (empty for df = 1, where Q is the pure
    * erfc term). df is bounded at 128: Γ(64.5) ≈ 1e88 is still exact
    * double arithmetic, and no experiment design has 129 arms.
    */
  def chi2Coeffs(df: Int): Seq[Double] = {
    require(df >= 1 && df <= 128, s"chi2Coeffs: df=$df not in [1, 128]")
    val m = df / 2
    if (df % 2 == 0) {
      // 1/j! for j = 0 .. m−1, built by the exact recurrence
      (0 until m).scanLeft(1.0)((acc, j) => acc / (j + 1.0)).init
    } else {
      // 1/Γ(j + 1/2) for j = 1 .. m via Γ(j + 1/2) = (j − 1/2)·Γ(j − 1/2)
      val g = (1 to m).scanLeft(math.sqrt(math.Pi))(
        (acc, j) => acc * (j - 0.5)).tail
      g.map(1.0 / _)
    }
  }

  /** Upper-tail p-value of a χ²_df statistic at integer df — the
    * exact finite closed form over the [[chi2Coeffs]] source (erfc
    * base term for odd df via the NR [[erfcc]] fit), clamped at 1.
    * Generalizes [[chi2P1]]: chi2P(x, 1) ≡ chi2P1(x) term for term.
    */
  def chi2P(stat: Double, df: Int): Double = {
    val cs = chi2Coeffs(df)
    val u = stat / 2.0
    val horner = cs.foldRight(0.0)((c, acc) => c + u * acc)
    val poly =
      if (df % 2 == 0) math.exp(-u) * horner
      else if (cs.isEmpty) 0.0
      else math.exp(-u) * math.sqrt(u) * horner
    val base = if (df % 2 == 1) erfcc(math.sqrt(u)) else 0.0
    math.min(1.0, base + poly)
  }

  /** [[chi2P]] as a Catalyst column expression — the same closed form
    * folded from the one [[chi2Coeffs]] source (and [[erfccCol]] for
    * the odd-df base term). `stat` must be >= 0.
    */
  def chi2PCol(stat: org.apache.spark.sql.Column,
               df: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{exp, least, lit, sqrt}
    val cs = chi2Coeffs(df)
    val u = stat / lit(2.0)
    val horner = cs.foldRight(lit(0.0): org.apache.spark.sql.Column)(
      (c, acc) => lit(c) + u * acc)
    val poly: org.apache.spark.sql.Column =
      if (df % 2 == 0) exp(-u) * horner
      else if (cs.isEmpty) lit(0.0)
      else exp(-u) * sqrt(u) * horner
    val base: org.apache.spark.sql.Column =
      if (df % 2 == 1) erfccCol(sqrt(u)) else lit(0.0)
    least(lit(1.0), base + poly)
  }

  /** [[erfcc]] as a Catalyst column expression — the SAME Horner chain,
    * term for term, folded from the one shared coefficient source. NOT
    * bit-identical to the scalar in general: Spark's codegen evaluates
    * `exp` via StrictMath while the JVM scalar path uses the Math
    * intrinsic, which may differ by 1 ulp — measured exactly 1 ulp at
    * a handful of inputs, pinned in ClassifierSpec, and absorbed by
    * every caller's round(9). `x` must be >= 0 (every χ²₁ caller
    * passes √(stat/2)); the scalar's negative-x reflection is
    * deliberately omitted rather than silently half-supported.
    */
  def erfccCol(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{exp, lit}
    val t = lit(1.0) / (lit(1.0) + lit(0.5) * x)
    val horner = ErfccCoeffs.foldRight(lit(0.0): org.apache.spark.sql.Column)(
      (c, acc) => lit(c) + t * acc)
    t * exp(-(x * x) + lit(ErfccLead) + t * horner)
  }
}
