package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.LongArrayIntersectSize

/** The merge-scan intersect expression must agree with the builtin
  * set-intersect on sorted duplicate-free arrays, in both codegen and
  * interpreted execution, and keep null-intolerant semantics.
  */
class LongArrayIntersectSizeSpec extends SparkSpec {
  import spark.implicits._

  private def randomSets(seed: Int, n: Int): Seq[(Seq[Long], Seq[Long])] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(n) {
      def set() = Seq.fill(rng.nextInt(30))(rng.nextInt(40).toLong).distinct.sorted
      (set(), set())
    }
  }

  test("matches size(array_intersect) on random sorted distinct arrays") {
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val df = randomSets(11, 200).toDF("a", "b")
        val bad = df
          .withColumn("fast", LongArrayIntersectSize.column(col("a"), col("b")))
          .withColumn("ref", size(array_intersect(col("a"), col("b"))))
          .filter(col("fast") =!= col("ref"))
          .count()
        assert(bad == 0, s"mismatch under $codegen")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null input yields null; empty arrays yield 0") {
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq.empty[Long]), Some(Seq(1L, 2L)))
    ).toDF("a", "b")
    val rows = df.select(LongArrayIntersectSize.column(col("a"), col("b")).as("c")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getInt(0) == 0)
  }
}
