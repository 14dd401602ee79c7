package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR, forcing FULL materialization through a noop write
  * (a bare count() would let Catalyst prune every computed column and
  * benchmark a hollow plan), and prints ONE JSON line.
  *
  * Failures are loud: the failing query records -1.0 and lands in an
  * "errors" object — never a silent fake timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen/parquet-footer paths so the alphabetically-first
    // query does not absorb several seconds of one-time startup cost.
    try {
      spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
      SparkEntry.queries("q02_byte_len")(spark, sfDir).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () } // warmup failures surface per-query below

    // optional args: query-name substrings to run (builder-local iteration;
    // the driver passes none and benches everything)
    val only = args.toSet
    // each query runs `runs` times (GC before each) and reports the MIN:
    // GC/codegen pressure from heavy predecessors only ever ADDS time, so
    // the minimum is the reproducible statistic — single-pass numbers
    // swung 2-3x between runs depending on query order.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    var times = Vector.empty[(String, Double)]
    var errors = Vector.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.exists(name.contains) }
      .foreach { case (name, fn) =>
      try {
        val samples = (1 to runs).map { _ =>
          // drop the previous run's localCheckpoint blocks + cached plans
          // BEFORE timing: 100+ queries each checkpointing a diamond left
          // gigabytes pinned in the block manager, and the resulting
          // eviction pressure made later queries drift slower round over
          // round as the registry grew (r4→r6: q31 6.0→9.5s, q52
          // 8.7→11.9s with no code change)
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          System.gc()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        times :+= (name -> samples.min)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          times :+= (name -> -1.0)
          errors :+= (name -> e.getClass.getSimpleName)
      }
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = times.map { case (k, v) => s"${jstr(k)}:${"%.3f".format(v)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.collect { case (_, v) if v >= 0 => v }.sum
    println(
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
