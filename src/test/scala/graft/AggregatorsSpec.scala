package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators

/** The typed-UDAF surface: exact integer accumulation means the result
  * must be identical under any partitioning / row order (the property a
  * naive double-summing aggregate lacks).
  */
class AggregatorsSpec extends SparkSpec {

  test("WeightedMean: known value, zero-weight group, and partition invariance") {
    import spark.implicits._
    val wavg = udaf(Aggregators.WeightedMean)
    // (group, cents, weight): g1 = (100*2 + 400*1) / 3 / 100 = 2.0 dollars
    val rows = Seq(("g1", 100L, 2L), ("g1", 400L, 1L), ("g2", 999L, 0L))
    val out = rows.toDF("g", "cents", "w")
      .groupBy("g").agg(wavg(col("cents"), col("w")).as("m"))
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("g1", 2.0), ("g2", 0.0)))

    val big = (1 to 1000).map(i => ("g", i.toLong * 100, (i % 5 + 1).toLong))
    val one = big.toDF("g", "cents", "w").repartition(1)
      .groupBy("g").agg(wavg(col("cents"), col("w")).as("m")).head().getDouble(1)
    val many = scala.util.Random.shuffle(big).toDF("g", "cents", "w").repartition(16)
      .groupBy("g").agg(wavg(col("cents"), col("w")).as("m")).head().getDouble(1)
    assert(one === many, "weighted mean must be partition- and order-invariant")
  }
}
