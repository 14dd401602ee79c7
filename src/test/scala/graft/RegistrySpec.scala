package graft

/** Driver-contract invariants over the query registry. */
class RegistrySpec extends SparkSpec {

  test("every registered query has an oracle (no rows-only checks remain)") {
    // NND oracle sizing is primed once for the whole test JVM in
    // SparkTestSession (Verify does the same before dumping
    // oracle_sql.json); `spark` forces that init
    spark
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    assert(q.subsetOf(o), s"queries without oracles: ${q.diff(o)}")
  }

  test("query names follow the qNN_snake convention") {
    assert(SparkEntry.queries.keys.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")))
  }

  test("pushdown audit: q20 scan carries pushed filters and a pruned schema") {
    val plan = SparkEntry.queries("q20_pricing_summary")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed to the parquet scan:\n$plan")
    // projection pruning: the scan must NOT read every lineitem column
    assert(!plan.contains("l_comment"), "scan reads unprojected columns")
  }

  test("partition pruning: q69's read scans only the lang=en partition") {
    val plan = SparkEntry.queries("q69_partitioned_sink")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter missing from the scan:\n$plan")
  }

  test("pushdown audit: q21 broadcasts both dimension joins") {
    val plan = SparkEntry.queries("q21_revenue_by_nation")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dimension join degraded to SMJ:\n$plan")
  }
}
