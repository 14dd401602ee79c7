package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions
import graft.functions.Fuzz

/** FoldPartialRatioCutoffPredicate: threshold comparisons on the cutoff
  * scorer must fold into the early-exit boolean expression — and the
  * fold must be answer-preserving.
  */
class OptimizerRuleSpec extends SparkSpec {

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("filter comparisons fold to partial_ratio_at_least; score uses stay untouched") {
    // a file-backed source: a local Seq collapses to a pre-evaluated
    // LocalRelation in the optimizer, hiding the filter entirely
    val src = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_name").as("t"), col("p_partkey").as("id"))

    val gt = src.filter(GraftFunctions.partialRatioCutoff(col("t"), lit("lavender"), 80) > 0)
    assert(optimized(gt).contains("partial_ratio_at_least"), optimized(gt))

    // rewrite is answer-preserving vs the un-foldable score form
    val direct = src
      .withColumn("s", GraftFunctions.partialRatioCutoff(col("t"), lit("lavender"), 80))
      .filter(col("s") > 0).select("id")
    assert(gt.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      direct.collect().map(_.getLong(0)).sorted.toSeq)

    val gte = src.filter(GraftFunctions.partialRatioCutoff(col("t"), lit("lavender"), 80) >= 80)
    assert(optimized(gte).contains("partial_ratio_at_least"), optimized(gte))

    // k >= cutoff would NOT be equivalent (a rounded score can sit below
    // k while still clearing the cutoff) — the rule must not fire
    val over = src.filter(GraftFunctions.partialRatioCutoff(col("t"), lit("lavender"), 80) > 90)
    assert(!optimized(over).contains("partial_ratio_at_least"), optimized(over))

    // score kept in the projection — no rewrite
    val proj = src.select(GraftFunctions.partialRatioCutoff(col("t"), lit("lavender"), 80).as("s"))
    assert(!optimized(proj).contains("partial_ratio_at_least"), optimized(proj))
  }

  test("partialRatioAtLeast == (partialRatioCutoff > 0) across random and edge pairs") {
    val rng = new scala.util.Random(42)
    def randStr(): String = {
      val alpha = "abcde XYZ0"
      (0 until rng.nextInt(20)).map(_ => alpha(rng.nextInt(alpha.length))).mkString
    }
    val edge = Seq("", "a", "ab", "ba", "hello", "hello world")
    val pairs = (edge.flatMap(a => edge.map(b => (a, b))) ++
      (1 to 500).map(_ => (randStr(), randStr())))
    for ((a, b) <- pairs; c <- Seq(1, 50, 80, 100)) {
      assert(
        Fuzz.partialRatioAtLeast(a, b, c) === (Fuzz.partialRatioCutoff(a, b, c) > 0),
        s"divergence on ($a, $b, $c)")
    }
  }
}
