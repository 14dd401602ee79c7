package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArrayDot

/** The codegen'd dot-product kernels must be BIT-IDENTICAL to the HOF
  * folds they replaced (same accumulation order), since every embedding
  * score they feed is oracle-gated.
  */
class ArrayDotSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val fixture = Seq.fill(200)(
    (Array.fill(64)(rng.nextDouble() * 2 - 1), Array.fill(64)(rng.nextDouble() * 2 - 1))
  ).toDF("a", "b")

  test("doubleDot == the HOF fold, bit for bit, on random 64-d vectors") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val rows = fixture
      .select(ArrayDot.doubleDot(col("a"), col("b")).as("fast"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("longDot == the HOF fold on random quantized vectors") {
    val q = Seq.fill(200)(
      (Array.fill(64)(rng.nextInt(2001) - 1000L), Array.fill(64)(rng.nextInt(2001) - 1000L))
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val rows = q.select(ArrayDot.longDot(col("a"), col("b")).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null array input yields null (same as the HOF form)") {
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(ArrayDot.doubleDot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("ragged (length-mismatched) arrays yield null, not a prefix score") {
    // the HOF form (zip_with pads with nulls, sum propagates) returns
    // null on ragged input; a corrupt vector must surface, not produce a
    // plausible-looking truncated dot/distance — interpreted path
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(ArrayDot.doubleDot(col("a"), col("b"))).head().isNullAt(0))
    val dl = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    assert(dl.select(ArrayDot.longDot(col("a"), col("b"))).head().isNullAt(0))
    assert(dl.select(ArrayDot.longSqDist(col("a"), col("b"))).head().isNullAt(0))
    // codegen path: range source keeps a real codegen stage
    val cg = spark.range(3).select(
      transform(sequence(lit(1), lit(4)), i => (col("id") + i).cast("double")).as("a"),
      transform(sequence(lit(1), lit(3)), i => (col("id") * i).cast("double")).as("b"))
      .select(ArrayDot.doubleDot(col("a"), col("b")).as("d"))
    assert(cg.collect().forall(_.isNullAt(0)))
  }

  test("the kernel participates in whole-stage codegen (no HOF barrier)") {
    // a local fixture would be constant-folded into a LocalTableScan by
    // ConvertToLocalRelation (which exercises the interpreted path); a
    // range source keeps a real codegen stage, and the collect compiles
    // and runs the generated java
    val df = spark.range(10).select(
      transform(sequence(lit(1), lit(4)), i => (col("id") + i).cast("double")).as("a"),
      transform(sequence(lit(1), lit(4)), i => (col("id") * i).cast("double")).as("b"))
      .select(col("a"), col("b"), ArrayDot.doubleDot(col("a"), col("b")).as("d"))
    // the `*(n)` prefix marks a WholeStageCodegen stage in the simple
    // plan format; the dot's Project must carry it (the HOF transform
    // projection building the fixture arrays is itself stage-broken —
    // exactly the barrier the custom expression avoids)
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[a#.*double_array_dot""".r.findFirstIn(plan).nonEmpty, plan)
    val r0 = df.orderBy("d").head() // id=0: a=(1,2,3,4), b=(0,0,0,0) -> 0.0
    assert(r0.getDouble(2) == 0.0)
  }
}
