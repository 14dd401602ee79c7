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

  test("rangeJoinBackWindow: matches an unbanded inequality join exactly") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i => (i.toLong, s"u${i % 5}", rnd.nextInt(10000).toLong)).toDF("lid", "k", "lts")
    val right = (1 to 300).map(i => (i.toLong, s"u${i % 5}", rnd.nextInt(10000).toLong)).toDF("rid", "k", "rts")
    val banded = graft.operators.Joins
      .rangeJoinBackWindow(left, right, "k", "lts", "rts", window = 500L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = left.join(right, Seq("k"))
      .where(col("rts") >= col("lts") - 500L && col("rts") <= col("lts"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(banded == plain)
    assert(plain.nonEmpty)
  }

  test("rangeJoinBackWindow: boundary timestamps included, outside excluded") {
    val left = Seq((1L, "u", 1000L)).toDF("lid", "k", "lts")
    val right = Seq((10L, "u", 500L), (11L, "u", 1000L), (12L, "u", 499L), (13L, "u", 1001L))
      .toDF("rid", "k", "rts")
    val got = graft.operators.Joins
      .rangeJoinBackWindow(left, right, "k", "lts", "rts", window = 500L)
      .select("rid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(10L, 11L)) // [lts-500, lts] inclusive both ends
  }

  test("rangeJoinForwardWindow: matches an unbanded inequality join exactly") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 200).map(i => (i.toLong, s"u${i % 5}", i % 3, rnd.nextInt(5000).toLong))
      .toDF("lid", "k1", "k2", "lp")
    val right = (1 to 300).map(i => (i.toLong, s"u${i % 5}", i % 3, rnd.nextInt(5000).toLong))
      .toDF("rid", "k1", "k2", "rp")
    val banded = Joins
      .rangeJoinForwardWindow(left, right, Seq("k1", "k2"), "lp", "rp", window = 40L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = left.join(right, Seq("k1", "k2"))
      .where(col("rp") >= col("lp") && col("rp") < col("lp") + 40L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(banded == plain)
    assert(plain.nonEmpty)
  }

  test("rangeJoinForwardWindow: half-open [lp, lp+w) — start included, end excluded") {
    val left = Seq((1L, "u", 1000L)).toDF("lid", "k", "lp")
    val right = Seq((10L, "u", 999L), (11L, "u", 1000L), (12L, "u", 1499L), (13L, "u", 1500L))
      .toDF("rid", "k", "rp")
    val got = Joins
      .rangeJoinForwardWindow(left, right, Seq("k"), "lp", "rp", window = 500L)
      .select("rid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(11L, 12L))
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
