package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sources and sinks matching the reference's I/O surface
  * (/root/reference/src/heurFuzz.py:10-20, :131-136;
  * /root/reference/src/example_helpers/parse_inputs.py:27-42).
  */
object Readers {

  /** Line-delimited text -> (id, term): stable 0-based input-order row id,
    * Python-strip applied (the reference strips every line at read,
    * /root/reference/src/heurFuzz.py:15). zipWithIndex preserves file line
    * order across partitions (partitions are ordered by file offset), so
    * `id` is a faithful replacement for the reference's row index without
    * forcing the file into one partition.
    */
  def lines(spark: SparkSession, path: String, idCol: String = "id", termCol: String = "term"): DataFrame = {
    import spark.implicits._
    spark.read
      .textFile(path)
      .rdd
      .zipWithIndex()
      .map { case (v, i) => (i, v) }
      .toDF(idCol, "raw")
      .withColumn(termCol, TextFunctions.pyStrip(col("raw")))
      .drop("raw")
  }

  /** Scale-path variant of `lines`: input-order ids WITHOUT the extra
    * counting pass zipWithIndex needs (and without dropping out of
    * whole-stage codegen at the first operator).
    * `monotonically_increasing_id` is (partitionIndex << 33 | rowInPartition)
    * and a single text file splits into offset-ordered partitions, so
    * sorting by id IS input order — but ids are NOT contiguous (gaps
    * between partitions). Everything downstream in the match pipeline
    * needs only ordering + uniqueness (tie-breaks compare id ORDER, never
    * id VALUES), so results are identical to `lines`.
    * Caveat: for a directory of files the inter-file order follows
    * Spark's listing order, not filename order — the reference reads
    * single files (heurFuzz.py:10), so this matches its surface.
    */
  def linesFast(spark: SparkSession, path: String, idCol: String = "id", termCol: String = "term"): DataFrame =
    spark.read
      .text(path)
      .select(
        monotonically_increasing_id().as(idCol),
        TextFunctions.pyStrip(col("value")).as(termCol)
      )

  /** Headered TSV (parse_inputs.py:31 uses csv.DictReader with '\t'). */
  def tsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true").csv(path)

  /** NCBI-style .dmp: pipe-delimited, field extracted then stripped
    * (parse_inputs.py:41: line.split("|")[1].strip()).
    */
  def dmpField(spark: SparkSession, path: String, fieldIndex: Int = 1): DataFrame =
    spark.read
      .text(path)
      .select(TextFunctions.pyStrip(split(col("value"), "\\|").getItem(fieldIndex)).as("term"))

  /** JSON-lines sink (one object per line, sharded). */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSON-lines source with an explicit schema (no inference scan — at
    * 100 TB an inference pass would read the data twice).
    */
  def jsonLines(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)

  /** Distributed TSV sink, ordered by `orderCol`, single output file.
    * The `coalesce(1)` is CLI parity (the reference writes one file); at
    * cluster scale drop it and let the sink shard.
    */
  def writeTsv(df: DataFrame, orderCol: String, path: String): Unit =
    df.orderBy(col(orderCol))
      .coalesce(1)
      .write
      .mode("overwrite")
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)

  /** Single exact-path TSV file (CLI parity with the reference's
    * `_dump_to_file`, /root/reference/src/heurFuzz.py:131-136): the ordered
    * frame is written as a Spark csv directory, then the lone part file is
    * moved to `outputFile`. The order column is dropped from the output.
    * Local-CLI convenience only — the distributed sink is `writeTsv`.
    */
  def writeTsvFile(df: DataFrame, orderCol: String, outputFile: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val stage = graft.Staging.dir("tsv-")
    val tmp = stage.resolve("out").toString
    val ordered = df.orderBy(col(orderCol)).drop(orderCol).coalesce(1)
    ordered.write
      .mode("overwrite")
      .option("sep", "\t")
      .option("header", "true")
      .csv(tmp)
    val part = new java.io.File(tmp).listFiles().find(_.getName.startsWith("part-")).get
    val target = Paths.get(outputFile).toAbsolutePath
    if (target.getParent != null) Files.createDirectories(target.getParent)
    Files.move(part.toPath, target, StandardCopyOption.REPLACE_EXISTING)
    graft.Staging.discard(stage)
  }
}
