package graft

import java.nio.file.Files
import graft.sources.Readers

/** Source/sink semantics (/root/reference/src/heurFuzz.py:10-20, 131-136;
  * parse_inputs.py:27-42).
  */
class ReadersSpec extends SparkSpec {

  test("lines: stable 0-based input-order ids, Python-strip applied") {
    val f = Files.createTempFile("graft-lines", ".txt")
    Files.writeString(f, "  alpha  \nbeta\n\tgamma\n")
    val rows = Readers.lines(spark, f.toString).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")))
  }

  test("linesFast: id order matches lines' contiguous order; strip applied") {
    val f = Files.createTempFile("graft-linesfast", ".txt")
    Files.writeString(f, "  alpha  \nbeta\n\tgamma\ndelta\n")
    val slow = Readers.lines(spark, f.toString).orderBy("id").collect().map(_.getString(1)).toSeq
    val fast = Readers.linesFast(spark, f.toString).orderBy("id").collect().map(_.getString(1)).toSeq
    assert(fast == slow)
    assert(fast == Seq("alpha", "beta", "gamma", "delta"))
  }

  test("dmpField: pipe-delimited field extract + strip (names.dmp shape)") {
    val f = Files.createTempFile("graft-dmp", ".dmp")
    Files.writeString(f, "1\t|\tall\t|\t\t|\tsynonym\t|\n2\t|\tBacteria\t|\t\t|\tscientific name\t|\n")
    val terms = Readers.dmpField(spark, f.toString).collect().map(_.getString(0)).toSet
    assert(terms == Set("all", "Bacteria"))
  }

  test("writeTsvFile: single exact-path file, header + input order, order col dropped") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-out").resolve("result.tsv").toString
    val df = Seq((2L, "b", "y"), (0L, "q", "m"), (1L, "a", "x"))
      .toDF("q_id", "query", "match")
    Readers.writeTsvFile(df, "q_id", out)
    val content = Files.readString(java.nio.file.Paths.get(out))
    assert(content == "query\tmatch\nq\tm\na\tx\nb\ty\n")
  }
}
