package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "u1", 100L), (2L, "u1", 205L), (3L, "u1", 50L),
    (4L, "u2", 300L), (5L, "u3", 10L)
  ).toDF("event_id", "user", "tsn")
  private val right = Seq(
    ("u1", 100L, 11L), ("u1", 200L, 12L), ("u2", 299L, 21L), ("u2", 301L, 22L)
  ).toDF("user", "tsn", "val")

  private def run() = AsofJoin.asofBackward(left, right, "user", "tsn", Seq("val"))
    .orderBy("event_id")
    .collect()
    .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("val")).map(_.toLong),
               Option(r.getAs[java.lang.Long]("asof_tsn")).map(_.toLong)))
    .toSeq

  test("backward-inclusive: equal timestamp matches; latest <= wins") {
    val rows = run()
    assert(rows(0) == ((1L, Some(11L), Some(100L)))) // ts 100 matches right at exactly 100
    assert(rows(1) == ((2L, Some(12L), Some(200L)))) // most recent of {100, 200}
  }

  test("left rows before any right row get nulls (left semantics)") {
    val rows = run()
    assert(rows(2) == ((3L, None, None)))  // u1@50: nothing at or before
    assert(rows(4) == ((5L, None, None)))  // u3: key has no right rows at all
  }

  test("future right rows are invisible") {
    val rows = run()
    assert(rows(3) == ((4L, Some(21L), Some(299L)))) // u2@300 sees 299, not 301
  }

  test("null right values do not mix rows: ts and value come from the SAME right row") {
    // u1 has a newer right row whose value is legitimately NULL; the asof
    // result must be (ts=200, val=NULL) — not ts=200 paired with the
    // OLDER row's val=11 (the bug a per-column last(ignoreNulls) has)
    val r = Seq(
      ("u1", 100L, Some(11L)), ("u1", 200L, None)
    ).toDF("user", "tsn", "val")
    val l = Seq((1L, "u1", 250L)).toDF("event_id", "user", "tsn")
    val row = AsofJoin.asofBackward(l, r, "user", "tsn", Seq("val"))
      .select("event_id", "val", "asof_tsn").head()
    assert(row.getLong(0) == 1L)
    assert(row.isNullAt(1), "value must be the matched row's NULL, not an older row's value")
    assert(row.getLong(2) == 200L)
  }

  test("clashing value column names are rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left, right.withColumnRenamed("val", "tsn2")
        .withColumnRenamed("tsn2", "event_id"), "user", "tsn", Seq("event_id"))
    }
  }

  test("a left column named asof_<ts> is rejected (same rule as the native path)") {
    val l = left.withColumn("asof_tsn", lit(0L))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(l, right, "user", "tsn", Seq("val"))
    }
    assert(e.getMessage.contains("asof_tsn"))
  }
}
