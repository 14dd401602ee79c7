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
}
