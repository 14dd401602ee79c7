package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Pins the 1-in-m audit sampling convention (Sampling.oneInM): the
  * bounded size at any corpus scale, the m = 1 degenerate case the
  * oracle gates rely on, determinism, and the opt-in spread.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("oneInM keeps ids that are multiples of m and stays ~target-bounded") {
    val df = (0L until 10000L).toDF("id")
    val s = Sampling.oneInM(df, "id", 100L)
    // m = 10000 div 100 = 100 -> exactly the multiples of 100
    val ids = s.select("id").as[Long].collect().sorted
    assert(ids.toSeq == (0L until 10000L by 100L))
    assert(s.select(max("m")).as[Long].head() == 100L)
    // the bound holds by construction: ceil(N / m) <= 2 * target
    assert(ids.length <= 200)
  }

  test("oneInM degrades to the full input (m = 1) below the target — the oracle-scale case") {
    val df = (0L until 50L).toDF("id")
    val s = Sampling.oneInM(df, "id", 100L)
    assert(s.count() == 50L)
    assert(s.select(max("m")).as[Long].head() == 1L)
  }

  test("oneInM spreadTo controls the output partitioning; default keeps the scan's") {
    val df = (0L until 10000L).toDF("id").coalesce(1)
    assert(Sampling.oneInM(df, "id", 100L).rdd.getNumPartitions == 1)
    assert(Sampling.oneInM(df, "id", 100L, spreadTo = 4).rdd.getNumPartitions == 4)
  }
}
