package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{NnDescent, Similarity}
import org.apache.spark.sql.graft.CheckpointStats

/** Builder-local measurement harness behind SCALE.md's at-scale rows —
  * the numbers the bench suite cannot produce: same-JVM paired A/Bs
  * (the only trustworthy comparison on this drifting host; see SCALE.md
  * round-13 second wave) and quality audits that need a brute-force
  * truth pass too expensive for the per-round oracle gate. Subcommands:
  *
  *   nnd-ab <table-dir>       knnGraph build, broadcast regime vs the
  *                            forced-shuffle regime (guard override = 0),
  *                            interleaved B S B S in one pinned-heap JVM
  *   ivf-quality <table-dir>  recall@3/MRR of the q179 filtered-ANN
  *                            consumer per label-frequency band against
  *                            exact same-label truth, the q180 vector
  *                            leg's recall@10, and q180's fused ranking
  *                            vs a fusion with an EXACT vector leg
  *
  * Prints one JSON line per subcommand (the Bench convention). Extends
  * RegistryBase so the probes run the SAME constants and helpers the
  * registry queries run — a probe that re-derives k or the df stop cut
  * by hand would audit a config nobody ships.
  */
object ScaleProbe extends RegistryBase {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    // SPARK_GRAFT_SHUFFLE_PARTS > cpus shrinks PER-TASK state: a
    // shuffle-regime bag sort's transient disk is (concurrent tasks ×
    // per-task spill), and per-task spill scales with rows/partition —
    // at h120's 2.9B-row round-0 bag, 32 partitions put ~90M rows under
    // each local sort (≈ 2.7 GB spill/task × 28 concurrent > the box's
    // disk) where 256 partitions keep each sort near-memory-resident.
    // On a real cluster this is just "don't undersize
    // spark.sql.shuffle.partitions for the biggest stage".
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // multi-round shuffle-regime builds leave each round's shuffle
      // files on disk until the ContextCleaner GCs their references —
      // the default 30 min periodic GC lets a 7-round build stack every
      // round's spill on one box. At cluster scale the same knob exists
      // per-executor; locally a 1-min sweep keeps peak disk ≈ one round.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0) match {
      case "nnd-ab"         => nndAb(spark, args(1))
      case "nnd-rounds"     => nndRounds(spark, args(1),
        if (args.length > 2) args(2).toInt else 8,
        if (args.length > 3) args(3).toInt else NndK,
        if (args.length > 4) args(4).toInt else NndCap)
      case "ivf-quality"    => ivfQuality(spark, args(1))
      case "ivf-sweep"      => ivfSweep(spark, args(1))
      case "upsert-quality" => upsertQuality(spark, args(1))
      case other            => sys.error(s"unknown subcommand: $other")
    }
    spark.stop()
  }

  /** At-scale twin of GraphUpsertSpec's sf0.001 gate: recall@KnnGraphK of
    * the q203 upserted graph against the FULL NN-Descent REBUILD on the
    * merged corpus at the shipped config, plus both wall times — the
    * cheap-maintenance-vs-rebuild trade stated with its quality cost on
    * the same corpus it was measured on.
    */
  private def upsertQuality(s: SparkSession, dir: String): Unit = {
    def edges(df: DataFrame) =
      df.filter(col("rank") <= KnnGraphK).select("src", "dst")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // warm the base-graph artifact UNTIMED first: the production shape
    // is "graph exists, batch arrives", so the maintenance cost to
    // report is the warm upsert, not base-build + upsert
    SparkEntry.queries("q203_knn_graph_upsert")(s, dir)
      .write.format("noop").mode("overwrite").save()
    reset(s)
    val t0 = System.nanoTime()
    val up = edges(SparkEntry.queries("q203_knn_graph_upsert")(s, dir))
    val tUp = (System.nanoTime() - t0) / 1e9
    reset(s)
    val t1 = System.nanoTime()
    val rebuild = edges(NnDescent.knnGraph(
      rd(s, dir, "embeddings"), "vec_id", "embedding",
      k = 0, iters = 0, cap = 0))
    val tRb = (System.nanoTime() - t1) / 1e9
    val rec = if (rebuild.isEmpty) 1.0 else (up & rebuild).size.toDouble / rebuild.size
    // SAMPLED EXACT TRUTH (1-in-50 queries, full corpus scan per query):
    // on the near-uniform synthetic corpus the 3-round rebuild is itself
    // an approximation, so "recall vs rebuild" alone cannot distinguish
    // "upsert is bad" from "both are far from exact and disagree" —
    // anchor both against exact before concluding anything.
    val e = rd(s, dir, "embeddings")
    val exact = edges(Similarity.cosineTopK(
        e.filter(col("vec_id") % 50 === 0), e, "vec_id", "embedding", KnnGraphK.toInt)
      .select(col("q_id").as("src"), col("r_id").as("dst"), col("rank")))
    val nb = graphUpsertSplit(e).collect()(0)
    val nbase = nb.getLong(1)
    def vsExact(g: Set[(Long, Long)], newOnly: Boolean) = {
      val t = if (newOnly) exact.filter(_._1 >= nbase) else exact
      if (t.isEmpty) 1.0 else (g & t).size.toDouble / t.size
    }
    // rounds sweep: does the gap to the rebuild close with more
    // incremental rounds (log-N mixing), and at what cost?
    val arrivals = e.crossJoin(broadcast(graphUpsertSplit(e)))
      .filter(col("vec_id") >= col("nbase")).select("vec_id", "embedding")
    val baseGraph = nndGraphBase(s, dir)
    val sweep = (2 to 4).map { r =>
      reset(s)
      val t2 = System.nanoTime()
      val g = edges(NnDescent.upsertGraph(baseGraph, e, arrivals,
        "vec_id", "embedding", k = 0, rounds = r, cap = 0))
      val w = (System.nanoTime() - t2) / 1e9
      s""""rounds_$r":{"recall_vs_rebuild":${"%.4f".format(if (rebuild.isEmpty) 1.0 else (g & rebuild).size.toDouble / rebuild.size)},""" +
        s""""recall_vs_exact":${"%.4f".format(vsExact(g, newOnly = false))},""" +
        s""""new_node_recall_vs_exact":${"%.4f".format(vsExact(g, newOnly = true))},"wall_s":${"%.1f".format(w)}}"""
    }.mkString(",")
    println(
      s"""{"probe":"upsert_quality","n_edges_rebuild":${rebuild.size},"recall_vs_rebuild":${"%.4f".format(rec)},""" +
        s""""upsert_s":${"%.1f".format(tUp)},"rebuild_s":${"%.1f".format(tRb)},""" +
        s""""rebuild_recall_vs_exact":${"%.4f".format(vsExact(rebuild, newOnly = false))},""" +
        s""""rebuild_new_node_recall_vs_exact":${"%.4f".format(vsExact(rebuild, newOnly = true))},""" +
        s""""upsert_recall_vs_exact":${"%.4f".format(vsExact(up, newOnly = false))},""" +
        s""""upsert_new_node_recall_vs_exact":${"%.4f".format(vsExact(up, newOnly = true))},""" +
        s"""$sweep}""")
  }

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def reset(s: SparkSession): Unit = {
    s.catalog.clearCache()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
  }

  /** Same-JVM interleaved A/B of the two knnGraph scoring regimes: the
    * broadcast path (vector table under the guard) vs the documented
    * 100 TB fallback (guard forced to 0 → stats-reset sort-merge joins
    * everywhere). Interleaving B S B S samples both regimes early and
    * late in the JVM's life, so codegen/heap warm-up cannot masquerade
    * as a regime difference.
    */
  private def nndAb(s: SparkSession, dir: String): Unit = {
    val e = rd(s, dir, "embeddings")
    val n = e.count()
    val itersUsed = NnDescent.autoIters(n) // the shipped derived counts
    val kUsed = NnDescent.autoK(n)
    def build(): Double = { reset(s); timed {
      NnDescent.knnGraph(e, "vec_id", "embedding", k = 0, iters = 0, cap = 0)
        .write.format("noop").mode("overwrite").save()
    } }
    val key = "graft.nnd.broadcastMaxVecRows"
    // pin the broadcast arm EXPLICITLY to the shipped default: the bound
    // falls back to the SPARK_GRAFT_NND_BCAST_MAX env var after
    // sys.props, so merely removing the prop would silently compare an
    // env-overridden regime against itself (round-14 advice)
    require(!sys.env.contains("SPARK_GRAFT_NND_BCAST_MAX"),
      "unset SPARK_GRAFT_NND_BCAST_MAX: the A/B pins both regimes via sys.props")
    // spill + shuffle-write bytes per arm: round 15's shuffle arms DIED
    // on disk with no number attached — the A/B's job now includes
    // recording what each regime writes (the r15 verdict's done-bar)
    val metrics = new org.apache.spark.sql.graft.TaskMetricsAgg(s.sparkContext)
    var rows = Vector.empty[(String, Double, Long, Long)]
    for (regime <- Seq("broadcast", "shuffle", "broadcast", "shuffle")) {
      try {
        sys.props(key) = if (regime == "shuffle") "0" else "500000"
        metrics.snapshotAndReset()
        val w = build()
        val (spill, shuf) = metrics.snapshotAndReset()
        rows :+= ((regime, w, spill, shuf))
      } finally sys.props.remove(key)
    }
    def arr(r: String) =
      rows.filter(_._1 == r).map(v => "%.1f".format(v._2)).mkString("[", ",", "]")
    def mb(r: String, f: ((String, Double, Long, Long)) => Long) =
      rows.filter(_._1 == r).map(v => (f(v) / (1L << 20)).toString).mkString("[", ",", "]")
    println(s"""{"probe":"nnd_ab","n_vecs":$n,"k":$kUsed,"iters":$itersUsed,"cap":${NnDescent.autoCap(kUsed)},""" +
      s""""broadcast_s":${arr("broadcast")},"shuffle_s":${arr("shuffle")},""" +
      s""""broadcast_spill_mb":${mb("broadcast", _._3)},"shuffle_spill_mb":${mb("shuffle", _._3)},""" +
      s""""broadcast_shufwrite_mb":${mb("broadcast", _._4)},"shuffle_shufwrite_mb":${mb("shuffle", _._4)}}""")
  }

  /** Calibration curve behind autoIters (round-14 verdict item 1): ONE
    * incremental NN-Descent build at the shipped (k, cap), with
    * recall@KnnGraphK against SAMPLED EXACT truth (1-in-50 queries,
    * full-corpus scan each) measured after EVERY round — rounds 1..max
    * from a single pass, because round r's graph IS round r-1's plus one
    * iterateInc. The registry's derived round count is set from this
    * curve, not from the q196 audit (which certifies the recurrence on a
    * size-capped sample and is blind to round-count underscaling by
    * construction — the round-14 finding).
    */
  private def nndRounds(s: SparkSession, dir: String, maxRounds: Int,
      k: Int, cap: Int): Unit = {
    val e = rd(s, dir, "embeddings")
    val n = e.count()
    val vecs = CheckpointStats.freshCheckpoint(
      NnDescent.vecFrame(e, "vec_id", "embedding"))
    // exact-truth sample: ~1000 queries regardless of N (each query is a
    // full corpus scan, so the truth pass stays ~1000*N dots at any scale)
    val qMod = math.max(50L, n / 1000L)
    val exact = Similarity.cosineTopK(
        e.filter(col("vec_id") % qMod === 0), e, "vec_id", "embedding", KnnGraphK.toInt)
      .select("q_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(g: DataFrame): Double = {
      val got = g.filter(col("rank") <= KnnGraphK && col("src") % qMod === 0)
        .select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      if (exact.isEmpty) 1.0 else (got & exact).size.toDouble / exact.size
    }
    val bcastVecs = n <= NnDescent.BroadcastMaxVecRows
    val bcastGraph = k.toLong * n <= NnDescent.BroadcastMaxGraphRows
    // same slice policy as the composed builders (knnGraph/upsertGraph):
    // explicit override if set, else derive from (N, cap, dim, budget) —
    // the probe must exercise the plan the engine ships, and the shipped
    // default is now the sliced plan that survives, not the unsliced one
    // that died at 600k
    val slices =
      if (bcastVecs) 1
      else NnDescent.ExpansionSlicesOverride.getOrElse {
        val dim = vecs.select(size(col("dv"))).limit(1).collect()
          .headOption.map(_.getInt(0)).getOrElse(0)
        NnDescent.autoSlices(n, cap, dim)
      }
    System.err.println(s"[nnd-rounds] n=$n k=$k cap=$cap slices=$slices " +
      s"(override=${NnDescent.ExpansionSlicesOverride}, budget=${NnDescent.DiskBudgetBytes / (1L << 30)}GB)")
    val metrics = new org.apache.spark.sql.graft.TaskMetricsAgg(s.sparkContext)
    val g0 = CheckpointStats.freshCheckpoint(NnDescent.initGraph(e, "vec_id", k))
    var g: DataFrame = null
    val rows = (1 to maxRounds).map { r =>
      metrics.snapshotAndReset()
      val t0 = System.nanoTime()
      g = CheckpointStats.freshCheckpoint(
        if (r == 1)
          NnDescent.markNew(
            NnDescent.iterate(g0, vecs, k, cap, bcastVecs, round = 0,
              slices = slices)._2,
            g0, broadcastG0 = bcastGraph)
        else NnDescent.iterateInc(g, vecs, k, cap, bcastVecs, bcastGraph,
          round = r - 1, slices = slices)._2)
      val w = (System.nanoTime() - t0) / 1e9
      val (spill, shuf) = metrics.snapshotAndReset()
      val rec = recall(g)
      System.err.println(f"[nnd-rounds] k=$k cap=$cap round $r recall3=$rec%.4f " +
        f"wall=$w%.1fs spill=${spill / (1L << 20)}MB shufwrite=${shuf / (1L << 20)}MB")
      f"""{"round":$r,"recall3":$rec%.4f,"wall_s":$w%.1f,"spill_mb":${spill / (1L << 20)},"shufwrite_mb":${shuf / (1L << 20)},"auto_pick":${NnDescent.autoIters(n) == r}}"""
    }.mkString(",")
    println(s"""{"probe":"nnd_rounds","n_vecs":$n,"k":$k,"cap":$cap,"slices":$slices,"bcast_vecs":$bcastVecs,"bcast_graph":$bcastGraph,"rounds":[$rows]}""")
  }

  /** Quality record for the IVF consumers (round-13 verdict item 1):
    * q179's bucket key is (centroid_id, label), so rare labels inside
    * probed buckets can under-return harder than the unfiltered q131
    * sweep shows — this measures it per label-frequency band. q180's
    * vector leg is the cent8 ivfTopKQ at nprobe = 2; its at-scale effect
    * on the FUSED ranking is what matters, so the probe swaps in an
    * exact vector leg and diffs the fusion.
    */
  private def ivfQuality(s: SparkSession, dir: String): Unit = {
    val e = rd(s, dir, "embeddings")

    // ---- q179 (filtered ANN) vs exact same-label truth ----------------
    val got179 = SparkEntry.queries("q179_ivf_filtered_topk")(s, dir)
      .select("q_id", "r_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_lbl"),
        Similarity.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", Similarity.l2Norm(col("qv")))
    val c = e.select(col("vec_id").as("r_id"), col("label").as("r_lbl"),
        Similarity.asDouble(col("embedding")).as("rv"))
      .withColumn("rn", Similarity.l2Norm(col("rv")))
    val truth179 = c.join(broadcast(q),
        col("q_lbl") === col("r_lbl") && col("q_id") =!= col("r_id"))
      .withColumn("cos_sim",
        Similarity.dot(col("qv"), col("rv")) / (col("qn") * col("rn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("r_id").asc))
        .cast("long"))
      .filter(col("rank") <= 3)
      .select("q_id", "r_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val labelN = e.groupBy("label").agg(count(lit(1)).as("cnt"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val qLbl = q.select("q_id", "q_lbl").collect()
      .map(r => r.getLong(0) -> String.valueOf(r.get(1))).toMap
    val perQ = qLbl.keys.toSeq.sorted.map { qid =>
      val truth = truth179.filter(_._1 == qid)
      val got = got179.filter(_._1 == qid).sortBy(_._3).map(_._2)
      val hit = truth.count(t => got.contains(t._2))
      val recall = if (truth.isEmpty) 1.0 else hit.toDouble / truth.length
      val top1 = truth.find(_._3 == 1L).map(_._2)
      val rr = top1.map(t => got.indexOf(t)).filter(_ >= 0)
        .map(i => 1.0 / (i + 1)).getOrElse(0.0)
      (qid, labelN(qLbl(qid)), recall, rr)
    }
    // label-frequency bands: terciles of the queries by their label's
    // corpus count (rare | mid | common)
    val sortedByFreq = perQ.sortBy(_._2)
    val bandOf = sortedByFreq.zipWithIndex.map { case (r, i) =>
      r._1 -> Seq("rare", "mid", "common")(math.min(2, 3 * i / sortedByFreq.length))
    }.toMap
    def agg(rows: Seq[(Long, Long, Double, Double)]) =
      if (rows.isEmpty) (0, 0.0, 0.0)
      else (rows.length, rows.map(_._3).sum / rows.length, rows.map(_._4).sum / rows.length)
    val bands = Seq("rare", "mid", "common").map { b =>
      val (nq, rec, mrr) = agg(perQ.filter(r => bandOf(r._1) == b))
      s""""$b":{"n":$nq,"recall3":${"%.3f".format(rec)},"mrr":${"%.3f".format(mrr)}}"""
    }.mkString(",")
    val (_, rec179, mrr179) = agg(perQ)
    val perQJson = perQ.map { case (qid, ln, rec, rr) =>
      s"""{"q":$qid,"label_n":$ln,"recall3":${"%.3f".format(rec)},"rr":${"%.3f".format(rr)}}"""
    }.mkString("[", ",", "]")

    // ---- q180 (hybrid RRF): IVF leg recall + fusion vs exact-leg fusion
    val queries180 = e.filter(col("vec_id") % Bm25QueryMod === 0)
    val exactVec = Similarity.cosineTopK(queries180, e, "vec_id", "embedding", 10)
      .select(col("q_id"), col("r_id").as("doc_id"), col("rank").as("rk_v"))
      .localCheckpoint(false) // feeds the leg recall AND the exact fusion
    val cents = trainedArtifact(s, dir, "cent8") {
      val (tr, init) = trainSample8(s, e)
      Similarity.trainCentroids(tr, "vec_id", "embedding", init, KmeansIters)
    }
    val ivfVec = Similarity.ivfTopKQ(queries180, spread(s, e), cents,
        "vec_id", "embedding", k = 10, nprobe = 2)
      .select(col("q_id"), col("r_id").as("doc_id"), col("rank").as("rk_v"))
    val exactSets = exactVec.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val ivfSets = ivfVec.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    val legRecall = exactSets.toSeq.map { case (qid, t) =>
      if (t.isEmpty) 1.0 else (ivfSets.getOrElse(qid, Set.empty) & t).size.toDouble / t.size
    }
    val legRecall10 = if (legRecall.isEmpty) 1.0 else legRecall.sum / legRecall.length
    val hybrid = SparkEntry.queries("q180_hybrid_rrf")(s, dir)
      .select("q_id", "doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val text = SparkEntry.queries("q159_bm25_selective")(s, dir)
      .select(col("q_id"), col("doc_id"), col("rk").as("rk_t"))
    val exactFused = text.join(exactVec, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(expr("1000000000L div (60 + rk_t)"), lit(0L))
          + coalesce(expr("1000000000L div (60 + rk_v)"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rrf").desc, col("doc_id")))
        .cast("long"))
      .filter(col("rank") <= 5)
      .select("q_id", "doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val qids = exactFused.map(_._1).distinct.sorted
    val fusionRows = qids.map { qid =>
      val ex = exactFused.filter(_._1 == qid).sortBy(_._3).map(_._2)
      val hy = hybrid.filter(_._1 == qid).sortBy(_._3).map(_._2)
      val overlap =
        if (ex.isEmpty) 1.0 else (ex.toSet & hy.toSet).size.toDouble / ex.length
      val top1 = ex.headOption == hy.headOption
      (overlap, top1)
    }
    val overlap5 =
      if (fusionRows.isEmpty) 1.0 else fusionRows.map(_._1).sum / fusionRows.length
    val top1Agree =
      if (fusionRows.isEmpty) 1.0 else fusionRows.count(_._2).toDouble / fusionRows.length

    println(
      s"""{"probe":"ivf_quality","n_vecs":${e.count()},""" +
        s""""q179":{"recall3":${"%.3f".format(rec179)},"mrr":${"%.3f".format(mrr179)},"bands":{$bands},"per_query":$perQJson},""" +
        s""""q180":{"n_queries":${qids.length},"vec_leg_recall10":${"%.3f".format(legRecall10)},"fused_overlap5":${"%.3f".format(overlap5)},"fused_top1_agree":${"%.3f".format(top1Agree)}}}""")
  }

  /** Probe-depth → recall curve for the √N-IVF serving family (round-15
    * verdict item 3): the rare-label revisit trigger is dead — label
    * frequency is not the failure axis — while absolute recall@3 sits
    * at ~0.37–0.53 at h10, and the keep-IVF decision had no numeric bar
    * under it. This sweeps EXPLICIT probe depths around the shipped
    * auto rule (nprobe = ceil(sqrt(k_centroids))) on the exact serving
    * path (ivfTopKQServeStoredAuto over the persisted self-contained
    * index), measuring recall@3 vs exact truth for the unfiltered
    * q43 shape AND the label-filtered q179 shape, plus per-depth wall —
    * the depth/recall/cost curve the serving bar is written against.
    * ~500 sampled queries so the truth pass stays ~500·N dots at any N.
    */
  private def ivfSweep(s: SparkSession, dir: String): Unit = {
    val e = rd(s, dir, "embeddings")
    val n = e.count()
    val kc = math.ceil(math.sqrt(n.toDouble)).toLong
    val autoNp = math.ceil(math.sqrt(kc.toDouble)).toInt
    val qMod = math.max(50L, n / 500L)
    val queries = e.filter(col("vec_id") % qMod === 0).localCheckpoint(true)
    val index = ivfSqrtIndex(s, dir)
    val cents = sqrtCentroids(s, dir)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("q_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(queries, e, "vec_id", "embedding", 3))
    // same-label exact truth (the q179 contract: top-3 among same-label
    // corpus vectors, self excluded)
    val q = queries.select(col("vec_id").as("q_id"), col("label").as("q_lbl"),
        Similarity.asDouble(col("embedding")).as("qv"))
      .withColumn("qn", Similarity.l2Norm(col("qv")))
    val c = e.select(col("vec_id").as("r_id"), col("label").as("r_lbl"),
        Similarity.asDouble(col("embedding")).as("rv"))
      .withColumn("rn", Similarity.l2Norm(col("rv")))
    val exactF = pairs(c.join(broadcast(q),
        col("q_lbl") === col("r_lbl") && col("q_id") =!= col("r_id"))
      .withColumn("cos_sim",
        Similarity.dot(col("qv"), col("rv")) / (col("qn") * col("rn")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("r_id").asc)))
      .filter(col("rank") <= 3))
    def recall(got: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0 else (got & truth).size.toDouble / truth.size
    val depths = Seq(1, 2, 4, autoNp / 2, autoNp, 2 * autoNp, 4 * autoNp, 8 * autoNp)
      .filter(d => d >= 1 && d <= kc).distinct.sorted
    val rows = depths.map { np =>
      val t0 = System.nanoTime()
      val got = pairs(Similarity.ivfTopKQServeStoredAuto(
        queries, index, cents, "vec_id", "embedding", k = 3, nprobe = np))
      val w = (System.nanoTime() - t0) / 1e9
      val gotF = pairs(Similarity.ivfTopKQServeStoredAuto(
        queries, index, cents, "vec_id", "embedding", k = 3,
        labelCol = Some("label"), nprobe = np))
      val rec = recall(got, exact)
      val recF = recall(gotF, exactF)
      System.err.println(f"[ivf-sweep] nprobe=$np%3d (auto=$autoNp) recall3=$rec%.3f " +
        f"filtered=$recF%.3f wall=$w%.1fs probed_frac=${np.toDouble / kc}%.3f")
      f"""{"nprobe":$np,"recall3":$rec%.4f,"recall3_filtered":$recF%.4f,""" +
        f""""wall_s":$w%.1f,"probed_frac":${np.toDouble / kc}%.4f,"auto":${np == autoNp}}"""
    }.mkString(",")
    println(s"""{"probe":"ivf_sweep","n_vecs":$n,"k_centroids":$kc,"auto_nprobe":$autoNp,"n_queries":${queries.count()},"depths":[$rows]}""")
  }
}
