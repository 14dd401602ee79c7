package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: identical results to a plain equi-join on skewed data") {
    // 90% of rows share one hot key
    val large = (1 to 1000)
      .map(i => (if (i <= 900) 1L else i.toLong % 7, i.toLong, s"v$i"))
      .toDF("k", "row_id", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three"), (0L, "zero"))
      .toDF("k", "name")

    val plain = large.join(small, Seq("k")).select("k", "row_id", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Joins.saltedJoin(large, small, "k", "row_id", buckets = 8)
      .select("k", "row_id", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedJoin: salt spreads the hot key across buckets") {
    val large = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val saltCounts = large
      .withColumn("__salt", pmod(hash(col("row_id")), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length == 8) // every bucket used
    assert(saltCounts.max < 1000)  // no bucket holds everything
  }
}
