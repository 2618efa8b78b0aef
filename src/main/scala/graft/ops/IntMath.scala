package graft.ops

/** Deterministic integer math fragments shared by the entropy-class
  * operators (`text_perplexity`, `text_entropy`, `stats_psi_drift`).
  *
  * Cross-engine float determinism forbids libm (ln/exp differ in the
  * last ulp between implementations), so log2 is computed EXACTLY in
  * integers: ilog2 = length(bin(n)) − 1 (the `bin` spelling is
  * identical in Spark and DuckDB), chord-interpolated to 2^20 fixed
  * point. The chord is the piecewise-linear interpolant of log2 at
  * power-of-two knots: exact AT the knots, under-reading by at most
  * 0.0861 bits between them (concavity), and strictly monotone — so
  * sign(lg2fp(a) − lg2fp(b)) = sign(a − b), which is what makes
  * PSI-style (p−q)·log(p/q) terms provably non-negative.
  *
  * Headroom: the fragment computes n·2^20 in BIGINT, capping inputs at
  * ~8.8e12. The DECIMAL(38,0) doctrine cannot ride through `bin()`, so
  * operators whose inputs can exceed that (cross-products of 1e12-row
  * populations) must document the cap or pre-scale.
  */
object IntMath {

  /** 2^20 — the fixed-point unit. */
  val FP = 1048576L

  /** Spark SQL fragment: chord log2 of the (positive BIGINT-valued)
    * expression `x`, in units of 2^-20 bits.
    */
  def lg2fp(x: String): String =
    s"(length(bin($x)) - 1) * ${FP}L + (($x) * ${FP}L) div " +
      s"CAST(pow(2, length(bin($x)) - 1) AS BIGINT) - ${FP}L"

  /** DuckDB fragment for the same value (integer `//` division; the
    * SQL-sweep bridge maps `//` to Spark's `div`, so oracles built
    * from this fragment also run as literal Spark SQL).
    */
  def lg2fpDuck(x: String): String =
    s"(length(bin($x)) - 1) * $FP + (($x) * $FP) // " +
      s"CAST(pow(2, length(bin($x)) - 1) AS BIGINT) - $FP"

  /** Quadratic-corrected chord log2, still all-integer: with
    * f = frac position in [0, 2^20), the chord's log2(1+f) ≈ f is
    * corrected by the minimax parabola f·(1−f)·0.3444 (the integer
    * divisor 3044646 = round(2^20/0.3444)), cutting the max error from
    * 0.0861 to 0.0080 bits at the cost of one extra multiply. Use this
    * where per-term bias can FLIP a comparison (classifier argmax —
    * ml_naive_bayes measured 0.28→0.42 holdout accuracy switching from
    * the chord, matching exact-float NB); the plain chord stays right
    * for monotone filtering scores (perplexity/entropy gates), where
    * only the ordering matters and it is strictly monotone. Same
    * headroom cap as lg2fp (x ≤ ~8.8e12: x·2^20 must fit BIGINT); the
    * correction term peaks at 2^38, far inside range.
    */
  def lg2qfp(x: String): String = {
    val i = s"(length(bin($x)) - 1)"
    val f = s"(($x) * ${FP}L div CAST(pow(2, $i) AS BIGINT) - ${FP}L)"
    s"$i * ${FP}L + $f + $f * (${FP}L - $f) div 3044646L"
  }

  /** DuckDB twin of [[lg2qfp]]. */
  def lg2qfpDuck(x: String): String = {
    val i = s"(length(bin($x)) - 1)"
    val f = s"(($x) * $FP // CAST(pow(2, $i) AS BIGINT) - $FP)"
    s"$i * $FP + $f + $f * ($FP - $f) // 3044646"
  }
}
