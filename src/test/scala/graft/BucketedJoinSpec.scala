package graft

/** q77's whole point is the physical layout: both fact tables bucketed +
  * sorted on the join key, so the fact-fact join needs NO shuffle
  * exchange on either input (the property that lets a 100 TB join skip
  * re-shuffling both sides every query). The correctness gate checks the
  * values; this spec pins the plan.
  */
class BucketedJoinSpec extends SparkSpec {

  test("q77: bucketed fact-fact join plans without a shuffle on either join key") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: a broadcast join would trivially have no
    // exchange and prove nothing about the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q77_bucketed_join")(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(
        !plan.contains("Exchange hashpartitioning(l_orderkey") &&
          !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles a side:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"scan is not bucket-aware:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q132: persisted signature table joins with no exchange on the corpus side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: at test scale Spark would broadcast the
    // corpus bands and the no-exchange property would be vacuous
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q132_persisted_sig_dedup")(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"corpus scan is not bucket-aware:\n$plan")
      // exactly ONE (band, key) hash exchange: the incoming batch
      // shuffling into the bucket layout; the persisted corpus side rides
      // its bucketing with no exchange at all
      val bandExchanges = "Exchange hashpartitioning\\(band#".r
        .findAllMatchIn(plan).size
      assert(bandExchanges == 1,
        s"expected exactly one (band, key) exchange (incoming side only), got $bandExchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q126 pair stage: bucketed signature SELF-join plans with no exchange at all") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the q126 production shape: the full-corpus band table persisted
      // bucketed+sorted on the (band, key) join key, pair generation a
      // self-join reading it back — NEITHER side may shuffle or re-sort
      val tmp = java.nio.file.Files.createTempDirectory("sigall-spec")
      spark.sql("DROP TABLE IF EXISTS sigall_spec_bkt")
      graft.operators.Dedup.signatureBands(
          spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
          "doc_id", "text", shingleN = 4, numHashes = 8, rowsPerBand = 4)
        .write.format("parquet")
        .bucketBy(32, "band", "key").sortBy("band", "key")
        .option("path", s"$tmp/sig").mode("overwrite")
        .saveAsTable("sigall_spec_bkt")
      val df = graft.operators.Dedup.nearDupPairsOnBands(
        spark.table("sigall_spec_bkt"), "doc_id", threshold = 0.4)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      // bucket count is load-bearing: the zero-exchange self-join runs one
      // task per bucket, so fewer buckets than cores caps the machine
      // (SCALE.md round-10 A/B: 8 buckets served q126 22% slower on
      // local[32]) — pin both bucket-awareness AND the count
      assert(plan.contains("SelectedBucketsCount: 32 out of 32"),
        s"scan is not bucket-aware at 32 buckets:\n$plan")
      val bandExchanges = "Exchange hashpartitioning\\(band#".r
        .findAllMatchIn(plan).size
      assert(bandExchanges == 0,
        s"bucketed self-join must not shuffle either side, got $bandExchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q178 rides the persisted signature table (bucket-aware scan in the plan)") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q178_source_overlap_matrix")(spark, dir)
      .queryExecution.executedPlan.toString
    // the pair stage must READ the q126/q132 bucketed table, not re-hash
    // the corpus: the bucket-aware scan is the signature of that wiring
    assert(plan.contains("SelectedBucketsCount: 32 out of 32"),
      s"q178's pair stage is not reading the bucketed signature table:\n$plan")
  }

  test("q126 registry table: fullSigBands persists at 32 buckets (the benched layout)") {
    // run the shipped query so the registry stages its dir-scoped
    // signature table exactly as production would, then read the bucket
    // spec off the catalog — this pins the SHIPPED constant, not a
    // spec-local copy
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries("q126_leakage_safe_split")(spark, dir).count()
    val tbl = "graft_sig_all_bkt_" + java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    assert(spark.catalog.tableExists(tbl), s"registry did not stage $tbl")
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
      .collect().map(r => s"${r.getString(0)}|${r.getString(1)}").mkString("\n")
    assert(desc.contains("Num Buckets|32"),
      s"$tbl is not bucketed at 32:\n$desc")
  }
}
