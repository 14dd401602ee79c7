package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-memory distinct-count sketching: HyperLogLog (Flajolet et al.,
  * AofA'07) over an arbitrary (group, value) frame.
  *
  * At 100 TB a per-group `count(DISTINCT token)` shuffles every distinct
  * value; the HLL register table is 64 small integers per group — built
  * by ONE map-side-combined max aggregation — and the estimate reads off
  * the registers. The register table is also mergeable (max is
  * associative/commutative), so per-partition, per-day, or per-source
  * sketches union into a corpus sketch without touching raw data again.
  *
  * Everything is integer arithmetic (register index / rho window by
  * shift-and-mask on a 60-bit md5-derived hash, register contributions as
  * exact powers of two summed in BIGINT) except the single final
  * division, so the estimate is oracle-reproducible bit-for-bit; the
  * estimator numerator is computed once here and the SAME double literal
  * is embedded in the generated oracle SQL.
  *
  * The raw estimator only (no linear-counting small-range correction:
  * that needs ln(), and libm is not bit-portable across engines); the
  * zero-register count is surfaced so a caller can see when the
  * correction would have applied.
  */
object Sketches {

  /** Register-count exponent: m = 2^P = 64 registers per group. */
  val HllP = 6
  val HllM: Int = 1 << HllP

  /** Bits of hash inspected for the leading-zero rank above the register
    * index; rho ranges over [1, HllWindowBits + 1].
    */
  val HllWindowBits = 24
  private val RhoMax = HllWindowBits + 1

  /** alpha_64 * m^2 * 2^(window+1) — the estimator numerator over the
    * integer register-contribution sum S = sum_j 2^(RhoMax - M_j).
    * (alpha_64 = 0.709, Flajolet's constant for m = 64.)
    */
  val HllNumerator: Double =
    0.709 * (1L << (2 * HllP)).toDouble * (1L << RhoMax).toDouble

  /** Per-(group, register) HLL register table: j = h mod m, rho = leading
    * zeros + 1 within the `HllWindowBits`-bit window above the register
    * bits. One hash + mask per row, one map-side-combined max shuffle.
    * Returns (grpCol, j, mj) with mj in [1, RhoMax].
    */
  def hllRegisters(df: DataFrame, grpCol: String, valCol: String): DataFrame = {
    val h = conv(substring(md5(concat(lit("hll:"), col(valCol))), 1, 15), 16, 10)
      .cast("long")
    val w = shiftright(h, HllP) % (1L << HllWindowBits)
    val rho = when(w === 0, lit(RhoMax))
      .otherwise(lit(RhoMax) - length(bin(w)))
    df.select(col(grpCol), (h % HllM).as("j"), rho.as("rho"))
      .groupBy(grpCol, "j")
      .agg(max(col("rho")).as("mj"))
  }

  /** Per-group approximate distinct count. Returns
    * (grpCol, n_zero_regs, hll_est); expected standard error is
    * 1.04/sqrt(m) (~13% at m = 64).
    */
  def hllDistinct(df: DataFrame, grpCol: String, valCol: String): DataFrame =
    hllEstimate(hllRegisters(df, grpCol, valCol), grpCol)

  /** The estimator read-off over an existing register table (grp, j, mj)
    * — the entry point for MERGED sketches: register tables from
    * different partitions/days/micro-batches union and max-merge into
    * one, and the estimate is computed here exactly as for a single
    * sketch (max is associative, so merge order provably can't change
    * the answer — the q148 streaming gate pins this against q133's
    * batch oracle).
    */
  def hllEstimate(regs: DataFrame, grpCol: String): DataFrame =
    regs
      .withColumn("contrib",
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($RhoMax - mj AS INT))"))
      .groupBy(grpCol)
      .agg(count(lit(1)).as("n_present"), sum(col("contrib")).as("s_present"))
      .select(
        col(grpCol),
        (lit(HllM.toLong) - col("n_present")).as("n_zero_regs"),
        (lit(HllNumerator) /
          (col("s_present") +
            (lit(HllM.toLong) - col("n_present")) * lit(1L << RhoMax))
            .cast("double")).as("hll_est"))
}
