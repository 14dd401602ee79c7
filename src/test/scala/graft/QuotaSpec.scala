package graft

import graft.operators.Quota
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quota: the bucketed two-phase per-group quota/budget cutoff must be
  * row-identical to the naive single-window form it replaces (whose
  * per-group partition serializes the corpus through one task at scale).
  */
class QuotaSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    // 3 groups x 400 rows, adversarial ordering key (md5 — ties
    // impossible, order scattered across buckets)
    (0 until 1200).map(i => (i.toLong, s"src${i % 3}"))
      .toDF("id", "grp")
      .withColumn("ord", md5(concat(lit("t-"), col("id"))))
  }

  test("rankedQuota equals the naive per-group row_number window") {
    val df = fixture
    val quotas = Seq(("src0", 37L), ("src1", 1L), ("src2", 4000L)).toDF("grp", "quota")
    val got = Quota.rankedQuota(df, "grp",
        bucket = conv(substring(col("ord"), 1, 2), 16, 10).cast("long"),
        bucketAsc = true,
        ordCols = Seq(col("ord").asc, col("id").asc),
        quotas = quotas)
      .select("grp", "id", "rk").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy("grp").orderBy(col("ord").asc, col("id").asc)
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq("grp")).filter(col("rk") <= col("quota"))
      .select("grp", "id", "rk").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got == want)
    // quota larger than the group takes the whole group
    assert(got.count(_._1 == "src2") == 400)
    // quota 1 takes exactly the first row in md5 order
    assert(got.count(_._1 == "src1") == 1)
  }

  test("weightedBudget equals the naive per-group running-sum window (inclusive cutoff)") {
    val df = fixture.withColumn("wt", (col("id") % 7) + 1)
      .withColumn("len", (col("id") % 13).cast("int")) // coarse bucket with heavy ties
    val got = Quota.weightedBudget(df, "grp",
        bucket = col("len"), bucketAsc = false,
        ordCols = Seq(col("len").desc, col("id").asc),
        weightCol = "wt", budget = 300L, cumCol = "cum")
      .select("grp", "id", "cum").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy("grp").orderBy(col("len").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("wt")).over(w))
      .filter(col("cum") <= 300L)
      .select("grp", "id", "cum").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("exhausted buckets are pruned before any per-row ranking") {
    // quota 5 with 256 buckets: only the handful of buckets whose
    // cumulative count can still reach the quota may survive the
    // broadcast-join filter — the plan must not rank all 400 rows/group
    val df = fixture
    val quotas = Seq(("src0", 5L), ("src1", 5L), ("src2", 5L)).toDF("grp", "quota")
    val res = Quota.rankedQuota(df, "grp",
        bucket = conv(substring(col("ord"), 1, 2), 16, 10).cast("long"),
        bucketAsc = true,
        ordCols = Seq(col("ord").asc, col("id").asc),
        quotas = quotas)
    assert(res.count() == 15)
    // the per-row side after the cuts join is tiny: every surviving row
    // sits in a bucket whose predecessors held < 5 rows
    val survivors = df
      .withColumn("bkt", conv(substring(col("ord"), 1, 2), 16, 10).cast("long"))
      .groupBy("grp", "bkt").count()
      .withColumn("before", coalesce(sum("count").over(
        Window.partitionBy("grp").orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("before") < 5).count()
    assert(survivors < 30, s"bucket pruning should leave only boundary buckets, got $survivors")
  }
}
