package graft

import org.apache.spark.sql.functions._
import graft.operators.NnDescent

/** Invariants for the NN-Descent kNN-graph builder (the q186-family
  * candidate generator since round 12).
  */
class NnDescentSpec extends SparkSpec {

  /** 4 well-separated clusters of 10 vectors each in 64 dims: within a
    * cluster cosine is ~1 (base direction + small deterministic jitter),
    * across clusters ~0 (orthogonal base directions). NN-Descent must
    * recover the EXACT brute-force top-K graph here.
    */
  private def clusteredVecs = {
    import spark.implicits._
    (0 until 40).map { i =>
      val c = i % 4
      val v = Array.fill(64)(0.001f * ((i * 31) % 7 - 3))
      v(c * 16 + (i / 4) % 16) = 0.05f
      v(c * 16) += 1.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("initGraph: deterministic, no self-loops, <= k out-edges per node") {
    val g1 = NnDescent.initGraph(clusteredVecs, "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g2 = NnDescent.initGraph(clusteredVecs, "vec_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g1 == g2, "md5 draws must be reproducible")
    assert(g1.forall { case (s, d) => s != d })
    g1.groupBy(_._1).foreach { case (s, es) => assert(es.size <= 5, s"node $s") }
    assert(g1.forall { case (_, d) => d >= 0 && d < 40 })
  }

  test("knnGraph converges to the exact brute-force top-K on clustered data") {
    val vecs = clusteredVecs
    val g = NnDescent.knnGraph(vecs, "vec_id", "embedding", k = 3, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // brute force truth
    val v = NnDescent.vecFrame(vecs, "vec_id", "embedding")
    val cos = graft.operators.Similarity.dot(col("a.dv"), col("b.dv")) /
      (col("a.nrm") * col("b.nrm"))
    val brute = v.alias("a").crossJoin(v.alias("b"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"), cos.as("c"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("c").desc, col("dst").asc)).cast("long"))
      .filter(col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(g == brute, "clustered fixture must converge to the exact graph")
  }

  test("iterate: per-node best-so-far never degrades (candidates contain current edges)") {
    val vecs = NnDescent.vecFrame(clusteredVecs, "vec_id", "embedding")
    val g0 = NnDescent.initGraph(clusteredVecs, "vec_id", 3)
    val (_, g1) = NnDescent.iterate(g0, vecs, 3)
    val (_, g2) = NnDescent.iterate(g1, vecs, 3)
    def best(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("src").agg(max(col("cos_sim")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b1 = best(g1); val b2 = best(g2)
    b1.foreach { case (srcId, b) =>
      assert(b2.getOrElse(srcId, Double.MinValue) >= b - 1e-12,
        s"node $srcId best-so-far degraded")
    }
  }

  test("iterate with ρ-cap below 2k: candidate volume bounded, convergence intact") {
    val vecs = NnDescent.vecFrame(clusteredVecs, "vec_id", "embedding")
    val g0 = NnDescent.initGraph(clusteredVecs, "vec_id", 4)
    val nG0 = g0.count()
    // the shipped configuration's shape: cap < 2k (here 5 < 8). The
    // per-round candidate bound <= N*cap^2 + |g| must hold BY
    // CONSTRUCTION, and the cap must be deterministic (same call twice
    // == same candidates).
    val (cand1, r1) = NnDescent.iterate(g0, vecs, 4, cap = 5)
    assert(cand1.count() <= 40L * 5 * 5 + nG0,
      "capped two-hop expansion exceeded the N*cap^2 bound")
    val (cand2, _) = NnDescent.iterate(g0, vecs, 4, cap = 5)
    val c1 = cand1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c2 = cand2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(c1 == c2, "md5-rank cap sample must be reproducible")
    // ranks stay contiguous 1..k under the cap
    r1.collect().groupBy(_.getLong(0)).foreach { case (srcId, rows) =>
      val ranks = rows.map(_.getLong(3)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"node $srcId ranks: ${ranks.toSeq}")
    }
    // and the capped build still recovers the exact graph on the
    // clustered fixture. Config note (round 15): under the round-salted
    // ρ-sample the old (cap = 4, 5 rounds) trajectory permanently missed
    // ONE edge — once no edge is new the incremental skip freezes the
    // graph, so a cap-excluded pair can stay unscored forever (the
    // documented Dong-style approximation; salt churn re-routes which
    // pairs it hits on a 40-node fixture). cap = 5 (still < 2k = 6) with
    // one extra round converges exactly; at corpus scale the salt is
    // recall-neutral (SCALE.md round 15).
    val g = NnDescent.knnGraph(clusteredVecs, "vec_id", "embedding",
        k = 3, iters = 6, cap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val v = NnDescent.vecFrame(clusteredVecs, "vec_id", "embedding")
    val cos = graft.operators.Similarity.dot(col("a.dv"), col("b.dv")) /
      (col("a.nrm") * col("b.nrm"))
    val brute = v.alias("a").crossJoin(v.alias("b"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"), cos.as("c"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("c").desc, col("dst").asc)).cast("long"))
      .filter(col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(g == brute, "capped build must still converge on the clustered fixture")
  }

  test("incremental rounds ≡ full rounds when the cap does not bind") {
    // With cap above every node's undirected degree there is no ρ-sample
    // churn, and the new-leg skip is EXACT: an old-old two-hop pair's
    // legs were both in the previous round's adjacency, so the pair was
    // scored then, and the per-src top-k threshold only rises (g ⊆ the
    // merged candidates each round) — rescoring cannot change the graph.
    // This pins the incremental recurrence (knnGraph's path) against the
    // full recurrence it replaced.
    val vecs = NnDescent.vecFrame(clusteredVecs, "vec_id", "embedding")
    val bigCap = 1000 // > N, never binds on the 40-node fixture
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("src", "dst", "cos_sim", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val inc = edges(NnDescent.knnGraph(clusteredVecs, "vec_id", "embedding",
      k = 4, iters = 3, cap = bigCap))
    var g = NnDescent.initGraph(clusteredVecs, "vec_id", 4)
    for (_ <- 1 to 3) g = NnDescent.iterate(g, vecs, 4, cap = bigCap)._2
    val full = edges(g)
    assert(inc == full,
      "incremental new-leg rounds diverged from the full recurrence at an unbinding cap")
  }

  test("scoring round plan: broadcast vector joins + rank-limit pushdown") {
    // The two plan properties the round-13 rework bought, pinned so a
    // refactor can't silently lose them: (1) with broadcastVecs the two
    // vector-side joins are BroadcastHashJoins — the N·cap² candidate
    // pairs stay narrow and the 64-double arrays never ride a sorted
    // shuffle; (2) the dense_rank top-k cut gets WindowGroupLimit
    // pushdown (partial per-partition limiting before the exchange), so
    // the window never buffers the full candidate bag.
    val vecs = NnDescent.vecFrame(clusteredVecs, "vec_id", "embedding")
    val g0 = NnDescent.initGraph(clusteredVecs, "vec_id", 3)
    val (_, ranked) = NnDescent.iterate(g0, vecs, 3, cap = 100, broadcastVecs = true)
    val plan = ranked.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"scoring joins are not broadcast:\n${plan.take(2000)}")
    assert(plan.contains("WindowGroupLimit") && plan.contains("dense_rank"),
      s"dense_rank top-k lost WindowGroupLimit pushdown:\n${plan.take(2000)}")
  }

  test("forced shuffle regime (BroadcastMaxVecRows = 0): same graph, sort-merge plan") {
    // The documented 100 TB fallback (vector corpus beyond the broadcast
    // guard → shuffle joins) had never been exercised end-to-end before
    // round 14 — its correctness and plan were assertions in a comment.
    // Two pins: (1) the guard override forces the WHOLE build down the
    // shuffle path and the result is bit-identical to the broadcast
    // build (the plans must be semantically interchangeable, or the
    // guard boundary is a correctness cliff); (2) the scoring round's
    // physical plan under the stats-reset checkpoint really is
    // sort-merge — no auto-broadcast sneaks back in via stale stats.
    val key = "graft.nnd.broadcastMaxVecRows"
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val broadcastBuild = edges(
      NnDescent.knnGraph(clusteredVecs, "vec_id", "embedding", k = 4, iters = 3))
    val shuffleBuild =
      try {
        sys.props(key) = "0"
        edges(NnDescent.knnGraph(clusteredVecs, "vec_id", "embedding", k = 4, iters = 3))
      } finally sys.props.remove(key)
    assert(shuffleBuild == broadcastBuild,
      "shuffle-regime build diverged from the broadcast build")
    // the round shape knnGraph runs in the shuffle regime: stats-reset
    // vector table, no broadcast hints
    val vecs = org.apache.spark.sql.graft.CheckpointStats.freshCheckpoint(
      NnDescent.vecFrame(clusteredVecs, "vec_id", "embedding"))
    // the graph frame is stats-reset too (exactly knnGraph's round shape:
    // every per-round frame rides a freshCheckpoint)
    val g0 = org.apache.spark.sql.graft.CheckpointStats.freshCheckpoint(
      NnDescent.initGraph(clusteredVecs, "vec_id", 4))
    val (_, ranked) = NnDescent.iterate(g0, vecs, 4, cap = 8, broadcastVecs = false)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"shuffle regime lost its sort-merge joins:\n${plan.take(2000)}")
    assert(!plan.contains("BroadcastHashJoin"),
      s"shuffle regime still broadcasts (stale stats?):\n${plan.take(2000)}")
  }

  test("shuffle regime: the cap² expansion join scores at the pivot — nothing wide above it") {
    // The round-16 scale fix, pinned structurally (r15 verdict item 1):
    // past the broadcast boundary the two-hop expansion must be a
    // LOCAL JOIN — vectors attach to the N·cap adjacency edges BEFORE
    // the pivot self-join, cos_sim is computed in the join's projection,
    // and only narrow (src, dst, cos_sim) triples flow above it. The old
    // shape (expand narrow pairs, then join vectors per endpoint) sorted
    // N·cap² rows WITH a 64-double payload — measured at >60 GB of spill
    // at 50k vectors · cap 56 (SCALE.md round-15 wave 8). Identification:
    // the expansion join is the ONLY join with a non-equi residual
    // condition (dst != src rides the pivot join); the flat passes are
    // pure equi-joins.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.types.ArrayType
    val vecs = org.apache.spark.sql.graft.CheckpointStats.freshCheckpoint(
      NnDescent.vecFrame(clusteredVecs, "vec_id", "embedding"))
    val g0 = org.apache.spark.sql.graft.CheckpointStats.freshCheckpoint(
      NnDescent.initGraph(clusteredVecs, "vec_id", 4))
    def isWide(p: SparkPlan): Boolean =
      p.output.exists(_.dataType.isInstanceOf[ArrayType])
    // expansion joins found; wideAbove = ancestors of p that output an array column
    var found = 0
    def check(p: SparkPlan, wideAbove: Seq[String]): Unit = p match {
      case j: SortMergeJoinExec if j.condition.isDefined =>
        found += 1
        assert(isWide(j.left) && isWide(j.right),
          s"expansion join must consume vector payloads on BOTH inputs " +
            s"(scoring at the pivot), got:\n${j.toString.take(1500)}")
        assert(wideAbove.isEmpty,
          s"wide operators above the expansion join (vector payload rides the " +
            s"N·cap² frame): ${wideAbove.mkString("; ")}")
        j.children.foreach(c => check(c, Seq.empty))
      case _ =>
        val wa = if (isWide(p)) wideAbove :+ p.nodeName else wideAbove
        p.children.foreach(c => check(c, wa))
    }
    // iterate (round 0): one expansion join
    val (_, r0) = NnDescent.iterate(g0, vecs, 4, cap = 8, broadcastVecs = false)
    check(r0.queryExecution.sparkPlan, Seq.empty)
    assert(found == 1, s"expected exactly 1 expansion join in iterate, found $found")
    // iterateInc: the new-leg predicate rides into the same pivot join
    found = 0
    val g1 = org.apache.spark.sql.graft.CheckpointStats.freshCheckpoint(
      NnDescent.markNew(r0, g0))
    val (_, r1) = NnDescent.iterateInc(g1, vecs, 4, cap = 8,
      broadcastVecs = false, broadcastGraph = false, round = 1)
    check(r1.queryExecution.sparkPlan, Seq.empty)
    assert(found == 1, s"expected exactly 1 expansion join in iterateInc, found $found")
  }

  test("sliced expansion (bounded peak disk) is bit-identical to the single pass") {
    // ExpansionSlices > 1 runs the shuffle-regime expansion as S
    // checkpointed pivot-slice jobs (peak disk ~1/S). Exactness pin:
    // a full shuffle-regime build at slices = 3 must equal the
    // single-pass shuffle build AND the broadcast build bit-for-bit —
    // the union of per-slice top-k cuts is a superset of the global
    // top-k, and the final re-rank reproduces ranks exactly.
    val bKey = "graft.nnd.broadcastMaxVecRows"
    val sKey = "graft.nnd.expansionSlices"
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    def build() = edges(
      NnDescent.knnGraph(clusteredVecs, "vec_id", "embedding", k = 4, iters = 3, cap = 5))
    val broadcastBuild = build()
    val (shuffle1, shuffle3) =
      try {
        sys.props(bKey) = "0"
        val s1 = build()
        sys.props(sKey) = "3"
        val s3 = build()
        (s1, s3)
      } finally { sys.props.remove(bKey); sys.props.remove(sKey) }
    assert(shuffle1 == broadcastBuild, "single-pass shuffle build diverged")
    assert(shuffle3 == shuffle1, "sliced expansion diverged from the single pass")
  }

  test("derived-config sentinels are symmetric: k = 0 with default cap derives autoCap") {
    // Round-15 advice: cap's -1 default must not pair a derived width
    // with the legacy 2k sample when k derives. With k = 0 and cap left
    // at the default, the build must equal the fully-derived
    // (k = 0, cap = 0) build bit-for-bit.
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val derived = edges(NnDescent.knnGraph(clusteredVecs, "vec_id", "embedding",
      k = 0, iters = 2, cap = 0))
    val defaulted = edges(NnDescent.knnGraph(clusteredVecs, "vec_id", "embedding",
      k = 0, iters = 2))
    assert(defaulted == derived,
      "k = 0 with the default cap must derive autoCap, not the legacy 2k sample")
  }

  test("autoSlices: derivation arithmetic pinned at the round-16 anchors") {
    // Footprint model calibrated on the measured h120 round (SCALE.md
    // round-16 second wave): ~46 GB attach + ~39 GB narrow at
    // N = 600k, cap = 70, dim = 64. Budget fixed at this box's
    // measured ~39 GB (78 GB usable / 2) so the pins are host-free.
    val budget = 39L * 1000 * 1000 * 1000
    // h120 derived config: 2x29.4 GB per-slice-pair under the 39 GB
    // budget's half — S = 5 (round 16's hand-picked S = 3 survived with
    // 2x29+16 = 74 GB peak on a 78 GB device; the derivation must not
    // cut that close by default)
    assert(NnDescent.roundFootprintBytes(600000, 70, 64) === 88200000000L)
    assert(NnDescent.autoSlices(600000, 70, 64, budget) === 5)
    // h10 A/B (50k, cap 56): fits outright, must not slice
    assert(NnDescent.autoSlices(50000, 56, 64, budget) === 1)
    // the 1e9-derived width at 600k (the round-17 width-price run):
    // the one-resident model's S = 4 died of ENOSPC in round 2 when two
    // ~41 GB slices overlapped the cleaner lag; two-resident derives 9
    // at this fixed budget (8 at the live ~41 GB budget the run sees)
    assert(NnDescent.autoSlices(600000, 105, 64, budget) === 9)
    // degenerate inputs stay sane
    assert(NnDescent.autoSlices(0, 70, 64, budget) === 1)
    assert(NnDescent.autoSlices(600000, 70, 64, 1L) > 1)
    // the env/prop override wins over derivation in the builders
    val sKey = "graft.nnd.expansionSlices"
    try {
      sys.props(sKey) = "7"
      assert(NnDescent.ExpansionSlicesOverride === Some(7))
    } finally sys.props.remove(sKey)
    assert(NnDescent.ExpansionSlicesOverride === None)
  }

  test("knnGraph: ranks are 1..k contiguous per node, k respected") {
    val g = NnDescent.knnGraph(clusteredVecs, "vec_id", "embedding", k = 4, iters = 2)
      .collect()
    g.groupBy(_.getLong(0)).foreach { case (srcId, rows) =>
      val ranks = rows.map(_.getLong(3)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"node $srcId ranks: ${ranks.toSeq}")
      assert(ranks.length <= 4)
    }
  }
}
