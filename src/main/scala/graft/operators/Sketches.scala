package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    val h = org.apache.spark.sql.graft.Md5Long60.column(concat(lit("hll:"), col(valCol)))
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
  /** q145's target rank (exact BIGINT product, one double division) —
    * textually identical to RegistryBase.QuantTargetSql so the generated
    * oracle and the operator can never disagree on rounding.
    */
  val BinQuantTargetSql = "CAST(greatest(1, ceil(pct * n / 100.0)) AS BIGINT)"

  /** Equi-width bin-count quantile sketch over a NON-NEGATIVE integer
    * value column: (grp, bin = v div width, cnt). The whole sketch is one
    * map-side-combined aggregate and its size is value-range/width rows
    * per group — fixed memory regardless of row count, unlike the exact
    * per-value histogram (q145), whose size is the value cardinality.
    * Counts are additive over ANY row partition, so per-partition /
    * per-day / per-micro-batch sketches sum-merge into the corpus sketch
    * without re-reading raw data (the q182 streaming gate pins this
    * against the batch q181).
    */
  def binCounts(df: DataFrame, grpCol: String, valCol: String, width: Long): DataFrame = {
    require(width > 0, "bin width must be positive")
    df.groupBy(col(grpCol), expr(s"$valCol div $width").as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Percentile read-off over a bin-count sketch: for each (group, pct)
    * the FIRST bin whose cumulative count reaches the q145 target rank.
    * That bin provably CONTAINS the exact pct-quantile (bin cumulatives
    * majorize value cumulatives under the same order), so the estimate
    * is the interval [est_lo, est_hi] = [bin*width, bin*width + width-1]
    * with error bounded by the bin width BY CONSTRUCTION — width 1
    * degenerates to the exact quantile. Needs only the sketch: n is the
    * register sum, the cumulative window runs over range/width bins per
    * group, and everything stays BIGINT.
    */
  def quantileFromBins(bins: DataFrame, grpCol: String, width: Long, pcts: Seq[Long]): DataFrame = {
    val w = Window.partitionBy(grpCol).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins.withColumn("cum", sum(col("cnt")).over(w))
    val t = bins.groupBy(col(grpCol)).agg(sum(col("cnt")).as("n"))
      .select(col(grpCol), col("n"), explode(array(pcts.map(lit(_)): _*)).as("pct"))
      .withColumn("target", expr(BinQuantTargetSql))
    t.join(cum, Seq(grpCol))
      .filter(col("cum") >= col("target"))
      .groupBy(col(grpCol), col("pct"), col("target"))
      .agg(min(col("bin")).as("bin"))
      .select(
        col(grpCol), col("pct"), col("target"),
        (col("bin") * width).as("est_lo"),
        (col("bin") * width + (width - 1)).as("est_hi"))
  }

  /** Count-min sketch depth (independent hash rows) and width (buckets
    * per row) — shared by the q129 batch build and the q188 streaming
    * merge gate.
    */
  val CmsDepth = 4
  val CmsWidth = 256L

  /** Count-min sketch rows (j, bkt, c) over a (term, cnt) frame: row j's
    * bucket is an md5-derived hash of "j:term", c sums the counts landing
    * in the bucket (Cormode & Muthukrishnan, J.Alg'05). Bucket sums are
    * LINEAR in the term counts, so sketches over any row-partition of the
    * corpus (files, days, micro-batches) sum-merge into exactly the
    * corpus sketch — the q188 streaming gate pins this against q129's
    * batch oracle. d*w bounded rows out, one map-side-combined aggregate.
    */
  def cmsRows(terms: DataFrame, termCol: String, cntCol: String): DataFrame = {
    val rows = (0 until CmsDepth).map(j =>
      terms.select(lit(j.toLong).as("j"),
        cmsBucket(j, termCol).as("bkt"), col(cntCol).as("cnt")))
    rows.reduce(_.union(_))
      .groupBy("j", "bkt").agg(sum("cnt").as("c"))
  }

  /** Row-j bucket for a term: md5("j:term") folded to [0, CmsWidth). */
  def cmsBucket(j: Int, termCol: String) =
    pmod(org.apache.spark.sql.graft.Md5Long60.column(concat(lit(s"$j:"), col(termCol))),
      lit(CmsWidth))

  /** Point-estimate read-off: each (term, cnt) probes its CmsDepth
    * buckets in the (broadcastable, d*w-row) sketch and takes the min —
    * the classic CMS upper bound (est >= cnt always; over-count bounded
    * by colliding mass).
    */
  def cmsEstimate(terms: DataFrame, sketch: DataFrame, termCol: String, cntCol: String): DataFrame = {
    val probes = (0 until CmsDepth).map(j =>
      terms.select(col(termCol), col(cntCol), lit(j.toLong).as("j"),
        cmsBucket(j, termCol).as("bkt")))
    probes.reduce(_.union(_))
      .join(broadcast(sketch), Seq("j", "bkt"))
      .groupBy(termCol, cntCol).agg(min("c").as("est"))
  }

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
