package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** HLL sketch properties beyond the q133 oracle gate: register bounds,
  * mergeability (the property that lets per-partition/per-day sketches
  * union into a corpus sketch without touching raw data), and the
  * estimator's accuracy band on known cardinalities.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def values(grp: String, n: Int, tag: String) =
    (0 until n).map(i => (grp, s"$tag-$i")).toDF("g", "v")

  test("register table is bounded by m per group with mj in [1, 25]") {
    val regs = Sketches.hllRegisters(values("a", 5000, "x"), "g", "v").collect()
    assert(regs.length <= Sketches.HllM)
    assert(regs.forall { r =>
      val j = r.getLong(r.fieldIndex("j")); val mj = r.getInt(r.fieldIndex("mj"))
      j >= 0 && j < Sketches.HllM && mj >= 1 && mj <= Sketches.HllWindowBits + 1
    })
  }

  test("registers merge: max-merge of split sketches == whole-corpus sketch") {
    val all = values("a", 4000, "x")
    val whole = Sketches.hllRegisters(all, "g", "v")
    val halves = Sketches
      .hllRegisters(all.filter(length(col("v")) % 2 === 0), "g", "v")
      .union(Sketches.hllRegisters(all.filter(length(col("v")) % 2 =!= 0), "g", "v"))
      .groupBy("g", "j").agg(max("mj").as("mj"))
    assert(whole.except(halves).isEmpty && halves.except(whole).isEmpty)
  }

  test("duplicates do not move the estimate") {
    val once = values("a", 2000, "x")
    val thrice = once.union(once).union(once)
    val e1 = Sketches.hllDistinct(once, "g", "v").collect().head.getDouble(2)
    val e3 = Sketches.hllDistinct(thrice, "g", "v").collect().head.getDouble(2)
    assert(e1 == e3)
  }

  test("estimate lands within 3 standard errors on known cardinalities") {
    // sigma = 1.04/sqrt(64) = 13%; 3 sigma = 39%
    val df = values("a", 1000, "x").union(values("b", 10000, "y"))
    val est = Sketches.hllDistinct(df, "g", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(est("a") - 1000) / 1000.0 < 0.39, s"a: ${est("a")}")
    assert(math.abs(est("b") - 10000) / 10000.0 < 0.39, s"b: ${est("b")}")
  }

  // ---- bin-quantile sketch (q181/q182) ---------------------------------

  private def skewed(grp: String, n: Int) =
    // deterministic skewed longs in [0, ~n*7): clusters + a long tail
    (0 until n).map(i => (grp, ((i * i) % (n * 7)).toLong)).toDF("g", "v")

  test("bin-quantile: chosen bin contains the exact quantile (err in [0, width))") {
    val df = skewed("a", 5000).union(skewed("b", 1234))
    val width = 100L
    val est = Sketches.quantileFromBins(
      Sketches.binCounts(df, "g", "v", width), "g", width, Seq(50L, 90L, 99L))
    val exact = Sketches.quantileFromBins(
        Sketches.binCounts(df, "g", "v", 1L), "g", 1L, Seq(50L, 90L, 99L))
      .select(col("g"), col("pct"), col("est_lo").as("ex"))
    val joined = est.join(exact, Seq("g", "pct")).collect()
    assert(joined.length == 6)
    joined.foreach { r =>
      val lo = r.getLong(r.fieldIndex("est_lo")); val hi = r.getLong(r.fieldIndex("est_hi"))
      val ex = r.getLong(r.fieldIndex("ex"))
      assert(lo <= ex && ex <= hi, s"exact $ex outside [$lo, $hi] in $r")
      assert(hi - lo == width - 1)
    }
  }

  test("bin-quantile: exact side (width 1) matches a driver-side sort") {
    val vals = (0 until 3000).map(i => ((i * 31 + 7) % 977).toLong)
    val df = vals.map(("g", _)).toDF("g", "v")
    val got = Sketches.quantileFromBins(
        Sketches.binCounts(df, "g", "v", 1L), "g", 1L, Seq(50L, 90L, 99L))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val sorted = vals.sorted
    for (p <- Seq(50, 90, 99)) {
      val target = math.max(1, math.ceil(p * vals.length / 100.0).toLong)
      assert(got(p.toLong) == sorted((target - 1).toInt), s"p$p")
    }
  }

  // ---- count-min sketch (q129/q188) ------------------------------------

  private def termCounts(n: Int) =
    // Zipf-ish: term t-i appears (n/(i+1)) times, aggregated form
    (0 until n).map(i => (s"t-$i", (n / (i + 1)).toLong)).toDF("term", "cnt")

  test("CMS estimate is an upper bound on every true count") {
    val terms = termCounts(500)
    val est = Sketches.cmsEstimate(
      terms, Sketches.cmsRows(terms, "term", "cnt"), "term", "cnt").collect()
    assert(est.length == 500)
    est.foreach { r =>
      assert(r.getLong(r.fieldIndex("est")) >= r.getLong(r.fieldIndex("cnt")), s"$r")
    }
  }

  test("CMS: sum-merged split sketches equal the whole sketch (q188's guarantee)") {
    // raw token stream: term t-i occurs (i%5)+1 times; split the CORPUS
    // rows the way micro-batches do, so the SAME term carries partial
    // counts in several slices
    val raw = (0 until 300).flatMap(i => (0 to i % 5).map(r => (s"t-$i", i + r)))
      .toDF("term", "idx")
    val whole = Sketches.cmsRows(
      raw.groupBy("term").agg(count(lit(1)).as("cnt")), "term", "cnt")
    val merged = (0 until 3).map(k =>
        Sketches.cmsRows(
          raw.filter(col("idx") % 3 === k).groupBy("term").agg(count(lit(1)).as("cnt")),
          "term", "cnt"))
      .reduce(_.union(_))
      .groupBy("j", "bkt").agg(sum("c").as("c"))
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
    // and the probe over the merged sketch is row-identical
    val terms = raw.groupBy("term").agg(count(lit(1)).as("cnt"))
    val a = Sketches.cmsEstimate(terms, whole, "term", "cnt")
    val b = Sketches.cmsEstimate(terms, merged, "term", "cnt")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("bin-quantile: sum-merged split sketches equal the whole sketch (q182's guarantee)") {
    val df = skewed("a", 4000)
    val whole = Sketches.binCounts(df, "g", "v", 50L)
    val merged = Sketches.binCounts(df.filter(col("v") % 3 === 0), "g", "v", 50L)
      .union(Sketches.binCounts(df.filter(col("v") % 3 === 1), "g", "v", 50L))
      .union(Sketches.binCounts(df.filter(col("v") % 3 === 2), "g", "v", 50L))
      .groupBy("g", "bin").agg(sum("cnt").as("cnt"))
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
    // and the read-off over the merged sketch is row-identical
    val a = Sketches.quantileFromBins(whole, "g", 50L, Seq(50L, 99L))
    val b = Sketches.quantileFromBins(merged, "g", 50L, Seq(50L, 99L))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
