package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quota / budget selection WITHOUT a per-group global window.
  *
  * The naive form — `row_number().over(Window.partitionBy(group))` or a
  * running `sum().over(...)` — serializes each group's ENTIRE data
  * through one task. With a handful of groups (sources, languages) that
  * is a single-digit-parallelism stage over the whole corpus: the one
  * plan shape that cannot survive a 100x scale-up (the reference has no
  * analogue; this is the "top-quota per domain" move every LLM data-mix
  * pipeline needs, cf. the temperature-sampling mix in q112).
  *
  * The scalable shape used here is the classic two-phase cutoff:
  *   1. bucket every row by an ORDER-PRESERVING coarse prefix of the
  *      sort key (first hex byte of the md5 order key, the raw n_chars
  *      value, ...). Bucket counts/sums per group are a tiny aggregate.
  *   2. a window over that tiny (group x bucket) frame yields each
  *      bucket's cumulative count/weight BEFORE it; buckets whose
  *      predecessors already exhaust the quota are dropped wholesale —
  *      no per-row work ever happens for them.
  *   3. only surviving buckets rank/sum within (group, bucket) — the
  *      window partition count is groups x buckets, and each partition
  *      holds ~N/buckets rows, restoring full parallelism. The global
  *      rank/cumulative is bucket-prefix + within-bucket value.
  *
  * Results are IDENTICAL to the naive window (same total order, same
  * cutoff), which is what the unchanged DuckDB oracles verify.
  */
object Quota {

  /** Top-`quota` rows per group in (`bucket`, ordCols) order, with their
    * 1-based global rank `rk`. `bucket` MUST be a coarse order-preserving
    * prefix of `ordCols` (rows in a lower bucket sort before every row in
    * a higher one); `bucketAsc` says whether buckets ascend in sort order.
    * `quotas` is a small (groupCol, quota) frame, broadcast.
    */
  def rankedQuota(
      df: DataFrame,
      groupCol: String,
      bucket: Column,
      bucketAsc: Boolean,
      ordCols: Seq[Column],
      quotas: DataFrame
  ): DataFrame = {
    val base = df.withColumn("__bkt", bucket)
    val bktOrd = if (bucketAsc) col("__bkt").asc else col("__bkt").desc
    val wc = Window.partitionBy(groupCol).orderBy(bktOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cuts = base.groupBy(col(groupCol), col("__bkt"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__before", coalesce(sum(col("__bn")).over(wc), lit(0L)))
      .join(quotas, Seq(groupCol))
      .filter(col("__before") < col("quota"))
      .select(col(groupCol), col("__bkt"), col("__before"), col("quota"))
    val wb = Window.partitionBy(groupCol, "__bkt").orderBy(ordCols: _*)
    base.join(broadcast(cuts), Seq(groupCol, "__bkt"))
      .withColumn("rk", (col("__before") + row_number().over(wb)).cast("long"))
      .filter(col("rk") <= col("quota"))
      .drop("__bkt", "__before", "quota")
  }

  /** GLOBAL (no group) inclusive running sum of `weightCol` in
    * (`bucket` asc, ordCols) order — the corpus-wide prefix sum behind
    * sequence packing and similar "position in the global stream"
    * operators, computed WITHOUT a partitionless window over the corpus
    * (which would drag every row through one task). Same bucket
    * contract as rankedQuota; the only serial stage is the cumulative
    * over the per-bucket aggregate (#buckets rows — keep buckets
    * ~sqrt(N) or a few hundred).
    */
  def globalCumSum(
      df: DataFrame,
      bucket: Column,
      ordCols: Seq[Column],
      weightCol: String,
      cumCol: String
  ): DataFrame = {
    val base = df.withColumn("__bkt", bucket)
    val wc = Window.orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cuts = base.groupBy(col("__bkt"))
      .agg(sum(col(weightCol)).as("__bw"))
      .withColumn("__before", coalesce(sum(col("__bw")).over(wc), lit(0L)))
      .select(col("__bkt"), col("__before"))
    val wb = Window.partitionBy("__bkt").orderBy(ordCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(cuts), Seq("__bkt"))
      .withColumn(cumCol, col("__before") + sum(col(weightCol)).over(wb))
      .drop("__bkt", "__before")
  }

  /** Rows per group whose running `weightCol` total in (`bucket`,
    * ordCols) order stays within `budget` (cutoff INCLUSIVE of the
    * current row, matching `sum().over(unboundedPreceding..currentRow)
    * <= budget`), with the running total as `cumCol`. Same bucket
    * contract as rankedQuota.
    */
  def weightedBudget(
      df: DataFrame,
      groupCol: String,
      bucket: Column,
      bucketAsc: Boolean,
      ordCols: Seq[Column],
      weightCol: String,
      budget: Long,
      cumCol: String
  ): DataFrame = {
    val base = df.withColumn("__bkt", bucket)
    val bktOrd = if (bucketAsc) col("__bkt").asc else col("__bkt").desc
    val wc = Window.partitionBy(groupCol).orderBy(bktOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cuts = base.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(col(weightCol)).as("__bw"))
      .withColumn("__before", coalesce(sum(col("__bw")).over(wc), lit(0L)))
      .filter(col("__before") < budget)
      .select(col(groupCol), col("__bkt"), col("__before"))
    val wb = Window.partitionBy(groupCol, "__bkt").orderBy(ordCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(cuts), Seq(groupCol, "__bkt"))
      .withColumn(cumCol, col("__before") + sum(col(weightCol)).over(wb))
      .filter(col(cumCol) <= budget)
      .drop("__bkt", "__before")
  }
}
