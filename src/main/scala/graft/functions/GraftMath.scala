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

  final val INVLN2 = 1.4426950408889634

  /** Cross-engine bit-deterministic exp, same contract as
    * [[portableLn]]: k = floor(x/ln2 + 1/2) (floor, not round — SQL
    * round() is half-away while Java's is half-up), r = x − k·ln2 via
    * the split constant, 16-term Taylor Horner, scale by 2^k (exact).
    * Swept 500 409 points over [−700, 700] incl. k·ln2 boundaries:
    * zero cross-engine mismatches, ≤ ~1.1 ulp vs true exp. Domain:
    * |x| ≤ 700 (no overflow/subnormal scaling); outside, falls back
    * to `Math.exp`. With [[portableLn]] this closes pow too:
    * x^a = portableExp(a · portableLn(x)) is bit-deterministic. */
  def portableExp(x: Double): Double = {
    if (!(math.abs(x) <= 700.0)) return Math.exp(x) // incl. NaN
    val kd = Math.floor(x * INVLN2 + 0.5)
    val r1 = x - kd * LN2HI
    val r = r1 - kd * LN2LO
    val p = 1.0 + r*(1.0 + r*(0.5 + r*(0.16666666666666666 + r*(0.041666666666666664
      + r*(0.008333333333333333 + r*(0.001388888888888889 + r*(0.0001984126984126984
      + r*(2.48015873015873e-05 + r*(2.7557319223985893e-06 + r*(2.755731922398589e-07
      + r*(2.505210838544172e-08 + r*(2.08767569878681e-09 + r*(1.6059043836821613e-10
      + r*(1.1470745597729725e-11 + r*(7.647163731819816e-13
      + r*4.779477332387385e-14)))))))))))))))
    Math.scalb(p, kd.toInt)
  }

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
