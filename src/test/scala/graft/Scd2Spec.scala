package graft

import java.sql.Timestamp
import graft.operators.Scd2

/** SCD2 history builder: change collapse, interval chaining, versioning. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  test("consecutive equal attributes collapse; intervals chain; last is current") {
    val feed = Seq(
      // key 1: A A B A -> versions A, B, A
      (1L, 10L, ts("2024-01-01"), "A"),
      (1L, 11L, ts("2024-01-05"), "A"),
      (1L, 12L, ts("2024-01-10"), "B"),
      (1L, 13L, ts("2024-01-20"), "A"),
      // key 2: single row -> one current version
      (2L, 20L, ts("2024-02-01"), "X")
    ).toDF("k", "ord", "t", "status")

    val out = Scd2.buildHistory(feed, "k", "t", "ord", "status")
      .orderBy("k", "version").collect()

    assert(out.length == 4)
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(2)).toSeq == Seq("A", "B", "A"))
    assert(k1.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    // valid_to of version N == valid_from of version N+1 (no gaps/overlap)
    assert(k1(0).getLong(4) == k1(1).getLong(3))
    assert(k1(1).getLong(4) == k1(2).getLong(3))
    assert(k1(0).getBoolean(5) == false && k1(2).getBoolean(5) == true)
    assert(k1(2).isNullAt(4)) // current version is open-ended
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2(0).getBoolean(5))
  }

  test("tie column orders same-timestamp changes deterministically") {
    val d = ts("2024-03-01")
    val feed = Seq(
      (1L, 2L, d, "B"),
      (1L, 1L, d, "A")
    ).toDF("k", "ord", "t", "status")
    val out = Scd2.buildHistory(feed, "k", "t", "ord", "status")
      .orderBy("version").collect()
    // ord ascending: A is version 1, B version 2
    assert(out.map(_.getString(2)).toSeq == Seq("A", "B"))
  }
}
