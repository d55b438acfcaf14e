package graft.functions

/** Cross-engine bit-deterministic math kernels.
  *
  * [[portableLn]] computes natural log as a FIXED finite sequence of
  * IEEE-754 double operations that the DuckDB oracle replays verbatim
  * in SQL ([[graft.Oracles]] generates the mirror), so both engines
  * produce the SAME bits on every input — unlike `Math.log` /
  * `StrictMath.log` / glibc `log`, which are each only faithful
  * (≤ 1 ulp) and disagree with each other in the last ulp on ~1e-3 of
  * inputs (measured: 3 988 disagreements per 400 000 draws over the
  * live idf/probability ranges, and NO jvm-side candidate can match
  * glibc everywhere — glibc itself returns the mis-rounded neighbor on
  * ~1.4e-4 of inputs). Bit parity by construction replaces the old
  * per-input "probe-verified" lottery.
  *
  * Algorithm: canonicalize x = m·2^k with m ∈ [s, 2s), s =
  * 0.7071067811865476 (the interval spans exactly one octave, so
  * (k, m) is unique no matter how an engine seeds k — here via
  * `getExponent`, in SQL via `floor(log2(x))`, with two exact
  * halve/double steps absorbing any ±1 seed difference); then
  * ln(m) = 2·atanh(t), t = (m−1)/(m+1) (m−1 is exact by Sterbenz),
  * as an 11-term odd-series Horner in t², and ln(x) recomposed with
  * the split constant k·LN2HI + (k·LN2LO + lnm) (LN2HI carries 33
  * mantissa bits, so k·LN2HI is exact for |k| < 2^19).
  *
  * Accuracy: ≤ ~2.1 ulp vs true ln (601 703-point sweep incl.
  * adversarial near-boundary inputs), identical bits in both engines
  * on every point of that sweep. Domain: positive NORMAL finite
  * doubles — zero/negative/NaN/Inf/subnormal fall back to `Math.log`
  * (no operator produces them; the smallest live probability is
  * ~1e-20, far above 2.2e-308). */
object GraftMath {
  final val S05   = 0.7071067811865476       // canonical interval lo
  final val S2    = 1.4142135623730951       // = 2*S05 exactly
  final val LN2HI = 0.6931471803691238       // 33-bit-high split of ln 2
  final val LN2LO = 1.9082149292705877e-10

  def portableLn(x: Double): Double = {
    if (!(x >= java.lang.Double.MIN_NORMAL) ||
        x == Double.PositiveInfinity) return Math.log(x)
    var k = Math.getExponent(x).toDouble
    var m = x / Math.scalb(1.0, k.toInt)
    if (m >= S2) { m /= 2.0; k += 1.0 } else if (m < S05) { m *= 2.0; k -= 1.0 }
    if (m >= S2) { m /= 2.0; k += 1.0 } else if (m < S05) { m *= 2.0; k -= 1.0 }
    val t = (m - 1.0) / (m + 1.0)
    val t2 = t * t
    val p = 1.0 + t2*(0.3333333333333333 + t2*(0.2 + t2*(0.14285714285714285
      + t2*(0.1111111111111111 + t2*(0.09090909090909091 + t2*(0.07692307692307693
      + t2*(0.06666666666666667 + t2*(0.058823529411764705 + t2*(0.05263157894736842
      + t2*(0.047619047619047616 + t2*0.043478260869565216))))))))))
    k*LN2HI + (k*LN2LO + 2.0*(t*p))
  }
}
