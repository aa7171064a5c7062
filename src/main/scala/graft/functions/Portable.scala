package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic numerics.
  *
  * Two cross-engine hazards make naive `round(sum(x), 4)` non-reproducible:
  *  1. float summation order — Spark's partial aggregation tree and a
  *     single-node engine accumulate in different orders, so the sums
  *     differ by ULPs and can straddle a rounding boundary;
  *  2. rounding algorithms — Spark rounds via BigDecimal on the double's
  *     shortest decimal representation, libm-based engines scale and
  *     `std::round` the binary value; at exact half-way decimals they
  *     disagree on IDENTICAL doubles.
  *
  * Fix: fixed-point. Per-row values are scaled to integers with a pure
  * IEEE expression (`floor(x * 10^s + 0.5)` — bit-identical everywhere),
  * summed exactly as longs (order-independent), and unscaled once. This
  * is also the semantically right call for money-like columns — the same
  * reason SQL engines aggregate DECIMAL, not DOUBLE.
  *
  * Scale note: at 10^12 rows × values ~10^9 the scaled long sum can
  * overflow; pick `scale` per column domain (sum(|x|)·10^s < 2^63).
  */
object Portable {

  private def p10(scale: Int): Double = math.pow(10, scale)

  /** Portable round-half-up: floor(x·10^s + 0.5)/10^s. Pure IEEE double
    * ops — identical result in any engine given an identical input. */
  def pround(c: Column, scale: Int): Column =
    floor(c * lit(p10(scale)) + lit(0.5)) / lit(p10(scale))

  /** Per-row scaled-integer representation. */
  def toFixed(c: Column, scale: Int): Column =
    floor(c * lit(p10(scale)) + lit(0.5)).cast("long")

  /** Exact, order-independent SUM: Σ round(x·10^s) as long, unscaled. */
  def fixedSum(c: Column, scale: Int): Column =
    sum(toFixed(c, scale)).cast("double") / lit(p10(scale))

  /** Exact-numerator AVG: fixedSum / count. */
  def fixedAvg(c: Column, scale: Int): Column =
    fixedSum(c, scale) / count(lit(1))

  // ---- SQL fragments mirroring the above 1:1 (for oracle queries) ----

  def sqlPround(expr: String, scale: Int): String = {
    val p = s"${p10(scale).toLong}.0"
    s"floor(($expr) * $p + 0.5) / $p"
  }

  def sqlFixedSum(expr: String, scale: Int): String = {
    val p = s"${p10(scale).toLong}.0"
    s"CAST(sum(CAST(floor(($expr) * $p + 0.5) AS BIGINT)) AS DOUBLE) / $p"
  }

  def sqlFixedAvg(expr: String, scale: Int): String =
    s"(${sqlFixedSum(expr, scale)}) / count(*)"
}
