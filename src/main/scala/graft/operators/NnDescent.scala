package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CheckpointStats, Md5Long60}

/** kNN-graph construction by NN-Descent (Dong, Moses & Li, "Efficient
  * k-nearest neighbor graph construction for generic similarity
  * measures", WWW 2011) — the distribution-independent alternative to
  * banded LSH candidate generation.
  *
  * Why it exists here: on near-uniform embeddings (this corpus — global
  * cos mean 0.0, top-1 neighbor cos ~0.41) EVERY one-shot bucketed
  * generator (SRP bands, IVF single-probe) sits on the same poor
  * recall-vs-candidate-volume curve: the measured q196 audit gives SRP
  * 2x8 recall 0.047 at 0.9% of all pairs and 4x4 recall 0.478 only by
  * probing 23% of all pairs — near-brute-force. Widening the signature
  * just moves along that curve. NN-Descent beats the curve by
  * exploiting the GRAPH's structure instead of the (absent) data
  * structure: a neighbor of my neighbor is likely my neighbor, so
  * iterating "score neighbors-of-neighbors, keep the best k" converges
  * to the true graph in a handful of rounds (measured here: recall@3 =
  * 0.92 after 4 rounds at internal k = 20 on the sf0.1 corpus, vs
  * 0.047 for the SRP generator it replaces — the q196 audit certifies
  * both).
  *
  * 100 TB shape: every step is an equi-join or a bounded window —
  * never a cross join, never a driver loop over data. The per-round
  * candidate set is <= N * cap^2 rows BY CONSTRUCTION (each node
  * contributes its <= cap undirected neighbors' <= cap neighbor
  * lists), so total work is LINEAR in N per round at fixed k; rounds
  * needed grow ~log N. Vector payloads never ride a cap²-sized frame:
  * in the broadcast regime candidates stay narrow through map-side
  * vector joins, and in the shuffle regime scoring happens INSIDE the
  * pivot self-join (scoreTwoHopLocal) so only narrow
  * (src, dst, cos_sim) triples flow above it — spill drops by the
  * vector-width factor (round 16: the previously disk-fatal 50k·cap 56
  * A/B completes at 15.6 GB, and a 600k·cap 70 build completes
  * end-to-end). Peak disk is further boundable by pivot-slice
  * execution (ExpansionSlices). Each round is cut from lineage with
  * freshCheckpoint (stats-reset localCheckpoint — see CheckpointStats)
  * exactly like the q52 pointer-jumping loop; on a cluster this would
  * be a reliable-storage checkpoint.
  *
  * Determinism: the init graph is k deterministic md5-arithmetic draws
  * per node (the q195/q161 content-stable trick — reproducible by a
  * SQL oracle bit-for-bit, id-space-uniform, partitioning/retry
  * independent), and every round's top-k cut orders by (cos_sim DESC,
  * dst ASC) — a total order both engines share.
  */
object NnDescent {

  /** Normalized vector side: (vec_id, dv double[], nrm). */
  def vecFrame(vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    vectors.select(
        col(idCol).cast("long").as("vec_id"),
        Similarity.asDouble(col(vecCol)).as("dv"))
      .withColumn("nrm", Similarity.l2Norm(col("dv")))

  /** Deterministic random-regular init graph: k md5 draws per node over
    * the dense 0..N-1 id space, self-loops dropped, duplicates
    * collapsed — (src, dst) edge set with <= k out-edges per node.
    * NN-Descent's convergence does not depend on init quality (the
    * refinement rounds do the work), so the O(N) draw beats any
    * banded build as the starting point at scale.
    */
  def initGraph(vectors: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "init graph needs k >= 1")
    val nRow = vectors.agg(count(lit(1)).as("n"))
    vectors.select(col(idCol).cast("long").as("src"))
      .crossJoin(broadcast(nRow))
      .select(col("src"), col("n"), explode(sequence(lit(1L), lit(k.toLong))).as("i"))
      .withColumn("dst", pmod(
        Md5Long60.column(concat_ws("_", lit("nnd0"), col("src"), col("i"))),
        col("n")))
      .filter(col("dst") =!= col("src"))
      .select("src", "dst")
      .distinct()
  }

  /** Rows above which the scoring rounds stop broadcasting the vector
    * table and fall back to shuffle joins. 500k rows of 64-dim doubles
    * is ~260 MB in-plan (~3x that as a HashedRelation) — comfortable on
    * the 128 GiB-executor target, far under it on a real cluster's
    * 8-32 GiB executors only if dims stay modest; beyond the cap the
    * rounds shuffle, which is the honest 100 TB regime (at billions of
    * vectors the real co-location lever is partitioning the graph so
    * neighborhoods and their vectors land together — out of scope for
    * this builder, documented here so nobody mistakes the broadcast for
    * the scale path).
    */
  def BroadcastMaxVecRows: Long =
    sys.props.get("graft.nnd.broadcastMaxVecRows")
      .orElse(sys.env.get("SPARK_GRAFT_NND_BCAST_MAX"))
      .map(_.toLong).getOrElse(500000L)

  /** Number of pivot slices the SHUFFLE-regime expansion executes in
    * (default 1 = single pass). Slicing bounds PEAK DISK, which round
    * 16 measured to be the shuffle regime's true capacity limit even
    * after the narrow-triple fix: one h120 (600k · cap 70) round keeps
    * ~46 GB of wide attach shuffle + ~22 GB of partial-window output +
    * ~17 GB of flat-pass sort resident in a single job — more than
    * this box's 78 GB budget, and at 1B nodes more than a per-executor
    * disk budget too. With S slices the round runs as S independent
    * jobs, each expanding only the pivots with pivot_id % S == s,
    * cutting that slice's bag to per-src top-k, and CHECKPOINTING the
    * narrow cut so the slice's shuffle files are GC-able before the
    * next slice starts — peak disk drops ~1/S at the cost of S scans
    * of the (tiny) vector table and adjacency.
    *
    * EXACT, not approximate: every bag occurrence of a candidate pair
    * lands in exactly the slice of its generating pivot, and a pair in
    * the final per-src top-k ranks <= k within any subset of the bag
    * it appears in — so the union of slice top-k cuts is a superset of
    * the global top-k, and the final (cheap, narrow) re-rank
    * reproduces ranks bit-for-bit (the NnDescentSpec slicing test pins
    * slices = 3 ≡ slices = 1 on the fixture). Ids are dense 0..N-1, so
    * pmod(pivot, S) is a balanced split with zero hashing cost.
    *
    * Round 17: the slice count is DERIVED by default (autoSlices) in
    * knnGraph/upsertGraph — round 16 proved slicing is load-bearing for
    * any big shuffle-regime build (the unsliced 600k pass needed ~95 GB
    * of disk and died; S = 3 completed at 44 GB peak), so the engine
    * must not default to the plan that dies. The env/prop here is now
    * an explicit OVERRIDE for A/Bs and probes; unset means "derive".
    */
  def ExpansionSlicesOverride: Option[Int] =
    sys.props.get("graft.nnd.expansionSlices")
      .orElse(sys.env.get("SPARK_GRAFT_NND_SLICES"))
      .map(_.toInt)

  /** Legacy accessor: override or single-pass. Direct iterate/iterateInc
    * callers that pass no slice count land here; the composed builders
    * derive instead (see ExpansionSlicesOverride's scaladoc).
    */
  def ExpansionSlices: Int = ExpansionSlicesOverride.getOrElse(1)

  /** Local-disk budget one shuffle-regime expansion pass may occupy,
    * in bytes. Override via graft.nnd.diskBudgetBytes /
    * SPARK_GRAFT_NND_DISK_BUDGET; the default measures the usable space
    * on the device Spark actually spills to (spark.local.dir, default
    * java.io.tmpdir) and takes HALF — the safety factor covers what the
    * footprint model leaves out (checkpoint blocks from earlier rounds
    * awaiting the periodic cleaner, the vector/adjacency frames, other
    * tenants of the device). On a real cluster this conf would be the
    * per-executor scratch allotment; measuring the driver's tmpdir is
    * the local[k] stand-in.
    */
  def DiskBudgetBytes: Long =
    sys.props.get("graft.nnd.diskBudgetBytes")
      .orElse(sys.env.get("SPARK_GRAFT_NND_DISK_BUDGET"))
      .map(_.toLong)
      .getOrElse {
        val dir = new java.io.File(
          sys.props.getOrElse("spark.local.dir",
            System.getProperty("java.io.tmpdir", "/tmp")))
        math.max(1L << 30, dir.getUsableSpace / 2)
      }

  /** Resident-disk footprint model for ONE unsliced shuffle-regime
    * expansion pass, calibrated on the round-16 h120 measurement
    * (N = 600k, cap = 70, dim = 64: ~46 GB of wide attach shuffle +
    * ~22 GB of partial-window output + ~17 GB of flat-pass sort
    * resident in a single job — SCALE.md round-16 second wave):
    *
    *   attach  = 2 · N · cap · (8·dim + 48)   — both pivot sides carry
    *             one vector payload per adjacency edge (the narrow-
    *             triple fix bounds WIDE rows to these N·cap frames);
    *             48 B/row of ids/norm/shuffle framing. 47.0 GB at the
    *             anchor vs ~46 measured.
    *   narrow  = 14 · N · cap²                — the candidate bag's
    *             window partials + sort runs at ~13.3 B/row measured
    *             (the triples are 3 numbers, but sort framing and
    *             partial-window duplication ride along). 41.2 GB at
    *             the anchor vs ~39 measured.
    *
    * Total at the anchor: 88 GB modeled vs ~85 GB measured — the model
    * runs a few % conservative, which is the right side to miss on.
    */
  def roundFootprintBytes(n: Long, cap: Int, dim: Int): Long =
    2L * n * cap * (8L * dim + 48L) + 14L * n * cap * cap

  /** Derived slice count: the smallest S whose per-slice footprint
    * (footprint/S — both attach sides and the bag shrink linearly in S)
    * fits HALF the disk budget, because TWO slices' shuffle files can
    * be resident at once: slice s's files are freed by the periodic
    * ContextCleaner sweep AFTER slice s+1's jobs have started writing,
    * so the honest peak is base + 2·footprint/S, not base + footprint/S.
    * Measured, not assumed (round 17): at 600k·cap 105 the
    * one-resident model derived S = 4 (per-slice ~41 GB on a 78 GB
    * device, "fits") and the build died of ENOSPC in round 2 exactly
    * when two ~41 GB slices overlapped; the same model explains why
    * round 16's hand-picked S = 3 at cap 70 survived — 2·29 GB + 16 GB
    * base = 74 GB, just under the device. With the factor of 2: h120
    * cap 70 derives S = 5, cap 105 (the 1e9-width price run) derives
    * S = 8, and the h10 A/B still derives S = 1. NnDescentSpec pins
    * this arithmetic.
    */
  def autoSlices(n: Long, cap: Int, dim: Int,
      budget: Long = DiskBudgetBytes): Int =
    math.max(1, math.ceil(
      2.0 * roundFootprintBytes(n, cap, dim) / math.max(1L, budget)).toInt)

  /** Separate row bound for the GRAPH-side broadcasts (iterateInc's
    * anti-join pair set, markNew's init-graph marks): those frames are
    * k·N narrow (two longs) rows — up to 10M at NndK = 20 under the
    * 500k-vector guard — and a HashedRelation's per-row overhead, not
    * the 16-byte payload, dominates their footprint. Guarding them on
    * the VECTOR row count alone (round-13 advice) let several
    * hundred-MB-class graph relations pile on top of the two vector
    * broadcasts near the guard boundary. 8x the vector bound ≈ equal
    * bytes: a vector row is ~520 B of payload vs ~65 B/row for a
    * hashed narrow pair. Scales with any override of the vector bound
    * so a forced-shuffle A/B (bound = 0) forces BOTH sides off
    * broadcast.
    */
  def BroadcastMaxGraphRows: Long = 8L * BroadcastMaxVecRows

  private def vecSide(vecs: DataFrame, idAs: String, dvAs: String, nrmAs: String,
      bcast: Boolean): DataFrame = {
    val side = vecs.select(col("vec_id").as(idAs), col("dv").as(dvAs), col("nrm").as(nrmAs))
    if (bcast) broadcast(side) else side
  }

  /** Score a FLAT (src, dst) pair set: attach both endpoint vectors and
    * emit (src, dst, cos_sim). In the broadcast regime both joins are
    * map-side; in the shuffle regime the pair rows carry ONE vector
    * payload through one sorted shuffle — acceptable ONLY for pair sets
    * linear in N (current edges, upsert seeds: k·N rows), never for the
    * N·cap² two-hop expansion (which scores at the pivot — see
    * scoreTwoHopLocal).
    */
  private def scoreFlat(pairs: DataFrame, vecs: DataFrame, bcastVecs: Boolean): DataFrame =
    pairs
      .join(vecSide(vecs, "src", "dv_a", "nrm_a", bcastVecs), Seq("src"))
      .join(vecSide(vecs, "dst", "dv_b", "nrm_b", bcastVecs), Seq("dst"))
      .withColumn("cos_sim",
        Similarity.dot(col("dv_a"), col("dv_b")) / (col("nrm_a") * col("nrm_b")))
      .select("src", "dst", "cos_sim")

  /** Per-src top-k cut of a scored (src, dst, cos_sim) bag — the shared
    * tail of every scoring shape. dense_rank over the bag ≡ row_number
    * over the set: within a src partition the order key is strict
    * across DISTINCT pairs (equal keys ⟹ equal dst ⟹ same pair), so
    * ties are exactly the duplicates — dense_rank collapses them to one
    * rank and the post-cut distinct collapses the rows.
    */
  private def topKCut(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rank", dense_rank().over(
        Window.partitionBy("src").orderBy(col("cos_sim").desc, col("dst").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .distinct()

  /** Score the two-hop expansion of a capped undirected adjacency WITHOUT
    * ever materializing an N·cap²-row frame that carries a vector
    * payload — the shuffle-regime scale fix (round 16; the r15 verdict's
    * #1 item). The broadcast-regime plan keeps candidates narrow for
    * free (both vector joins are map-side), but past the broadcast
    * boundary the old shape (expand pairs, then join vectors per
    * endpoint) sorted N·cap² rows WITH a 64-double payload riding along:
    * measured spill >60 GB at 50k·cap 56 and an 80 GB-disk death at
    * 600k·cap 28 (SCALE.md round-15 waves 6 & 8) — ~N·cap²·vecWidth
    * bytes of disk, which no cluster absorbs at 1B nodes.
    *
    * This shape is Dong et al.'s LOCAL JOIN made physical: attach each
    * endpoint's vector to the N·cap adjacency EDGES (two sorted shuffles
    * of N·cap wide rows — linear in N·cap·vecWidth), sort-merge the two
    * edge sides on the shared pivot (each pivot holds ≤ cap rows per
    * side, so the join output is the same N·cap² bag, bounded per key —
    * no skew blowup), and compute cos_sim IN the join's projection so
    * only narrow (src, dst, cos_sim) triples flow downstream. Spill
    * drops by the vector-width factor (~30× for 64-double embeddings);
    * the cos expression, operand order, and bag multiplicity are
    * identical to the flat shape, so scores are bit-identical and every
    * family oracle is unaffected.
    *
    * `extraCond` lets iterateInc push its new-leg predicate into the
    * pivot join (columns of the aliased sides "a"/"b" are in scope).
    */
  private def scoreTwoHopLocal(und: DataFrame, vecs: DataFrame,
      extraCond: Column = lit(true), slice: Int = 0, slices: Int = 1): DataFrame = {
    // slices > 1 restricts the expansion to the pivots with
    // pivot % slices == slice (the pivot is a.dst == b.src); ids are
    // dense 0..N-1 so pmod is a balanced, zero-cost split. See
    // ExpansionSlices for why and for the exactness argument.
    val undA = if (slices <= 1) und
      else und.filter(pmod(col("dst"), lit(slices.toLong)) === slice)
    val undB = if (slices <= 1) und
      else und.filter(pmod(col("src"), lit(slices.toLong)) === slice)
    val sideA = undA.join(
      vecs.select(col("vec_id").as("src"), col("dv").as("dv_a"), col("nrm").as("nrm_a")),
      Seq("src"))
    val sideB = undB.join(
      vecs.select(col("vec_id").as("dst"), col("dv").as("dv_b"), col("nrm").as("nrm_b")),
      Seq("dst"))
    sideA.alias("a").join(sideB.alias("b"),
        col("a.dst") === col("b.src") && col("b.dst") =!= col("a.src") && extraCond)
      .select(col("a.src").as("src"), col("b.dst").as("dst"),
        (Similarity.dot(col("dv_a"), col("dv_b")) / (col("nrm_a") * col("nrm_b")))
          .as("cos_sim"))
  }

  /** One NN-Descent round. `g` is the current edge set (src, dst, ...);
    * `vecs` is vecFrame's (vec_id, dv, nrm). Returns (candidates,
    * ranked): the round's distinct scored candidate set — the
    * undirected graph's two-hop pairs plus the current edges — and its
    * per-src top-k cut (src, dst, cos_sim, rank). Exposed separately so
    * the q196 audit can report per-round candidate volume and recall
    * without re-deriving the recurrence.
    *
    * `broadcastVecs` selects the scoring shape: true → the narrow bag +
    * two map-side broadcast vector joins (nothing wide anywhere); false
    * (the 100 TB regime) → the pivot-local join (scoreTwoHopLocal), so
    * the sorted shuffles carry vectors only on N·cap-row frames and the
    * N·cap² expansion flows as narrow (src, dst, cos_sim) triples.
    * Callers set it from a size guard (knnGraph) or by construction
    * (the sample-bounded q196 audit). Scores are bit-identical across
    * the shapes (same bag multiset, same cos expression).
    *
    * `slices >= 1` pins the shuffle-regime slice count (the composed
    * builders pass autoSlices' derivation); `slices <= 0` keeps the
    * legacy behavior — the ExpansionSlices env/prop, default single
    * pass — for direct spec/probe callers.
    */
  def iterate(g: DataFrame, vecs: DataFrame, k: Int, cap: Int = -1,
      broadcastVecs: Boolean = false, round: Int = 0,
      slices: Int = 0): (DataFrame, DataFrame) = {
    // Undirected adjacency CAPPED per node (default 2k): out-degree is
    // <= k by construction, but REVERSE degree is unbounded — on
    // clustered data a hub vector can sit in millions of top-k lists,
    // and an uncapped two-hop self-join would emit in_degree^2 rows for
    // it. The cap is a deterministic md5-rank sample of the neighborhood
    // (Dong et al.'s reverse-neighbor ρ-sampling: cap = ρ·2k) — content-
    // stable, partitioning/retry independent, oracle-reproducible —
    // and makes the per-round candidate bound <= N*cap^2 TRUE by
    // construction rather than a uniform-data accident. ρ < 1 trades
    // a little per-round convergence for a quadratic candidate-volume
    // cut; the q196 audit certifies recall per round at the shipped cap.
    //
    // The sample is salted with the ROUND index (round 15): Dong et
    // al.'s ρ-sampling draws a FRESH sample every iteration, so over
    // rounds every neighbor eventually participates in the local join;
    // a round-independent md5 rank excluded the SAME edges every round.
    // Measured honestly: the salt lifts the 50k plateau only ~+0.01
    // (0.600 vs 0.588 at k = 20 x 8 rounds) — the convergence ceiling
    // is the working WIDTH (autoK), not sample staleness — but fresh-
    // per-round is the published recurrence and costs nothing, so it
    // ships. Callers pass the oracle's unroll index t; the default 0
    // keeps single-round uses (and the round-0 build) on the t = 0 draw.
    val capN = if (cap > 0) cap else 2 * k
    val und = g.select(col("src"), col("dst"))
      .union(g.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .withColumn("rk", row_number().over(Window.partitionBy("src").orderBy(
        Md5Long60.column(concat_ws("_",
          lit("nndr"), lit(round), col("src"), col("dst"))).asc,
        col("dst").asc)))
      .filter(col("rk") <= capN)
      .select("src", "dst")
    // the candidate BAG (duplicates allowed: one pair per generating
    // pivot) — the broadcast-regime scoring path works on this, never on
    // the deduped set
    val candBag = und.alias("a")
      .join(und.alias("b"),
        col("a.dst") === col("b.src") && col("b.dst") =!= col("a.src"))
      .select(col("a.src").as("src"), col("b.dst").as("dst"))
      .union(g.select(col("src"), col("dst")))
    // the candidate SET — returned for the audit's volume count (the
    // oracle's c$t is DISTINCT); the build itself never materializes it:
    // deduping the N·cap² bag was measured at 57 s of a 85 s round at
    // the 25x corpus while scoring the ~5% duplicate surplus costs ~1 s
    val cand = candBag.distinct()
    // Scoring: broadcast regime keeps the narrow bag + two map-side
    // vector joins (no shuffle touches the bag at all); shuffle regime
    // scores the two-hop expansion AT THE PIVOT (scoreTwoHopLocal) so
    // no N·cap²-row frame ever carries a vector payload, plus a flat
    // pass over the k·N current edges. Same bag multiset, same cos
    // expression ⟹ bit-identical scores in both shapes.
    val slicesEff =
      if (broadcastVecs) 1
      else if (slices >= 1) slices
      else math.max(1, ExpansionSlices)
    val scoredBag =
      if (broadcastVecs) scoreFlat(candBag, vecs, bcastVecs = true)
      else if (slicesEff == 1)
        scoreTwoHopLocal(und, vecs)
          .union(scoreFlat(g.select(col("src"), col("dst")), vecs, bcastVecs = false))
      else {
        // bounded-peak-disk execution (see ExpansionSlices): each slice
        // expands its pivots, scores, cuts to per-src top-k, and
        // CHECKPOINTS the narrow cut so its shuffle files free before
        // the next slice; the union re-ranks below — exact.
        (0 until slicesEff).map { sl =>
          CheckpointStats.freshCheckpoint(topKCut(
            scoreTwoHopLocal(und, vecs, slice = sl, slices = slicesEff)
              .union(scoreFlat(
                g.select(col("src"), col("dst"))
                  .filter(pmod(col("dst"), lit(slicesEff.toLong)) === sl),
                vecs, bcastVecs = false)), k)
            .select("src", "dst", "cos_sim"))
        }.reduce(_.unionByName(_))
      }
    // final per-src top-k (see topKCut for the bag ≡ set argument); the
    // cut output is ≤ N·k rows + duplicate surplus, ~40x smaller than
    // the bag (or ≤ slices·N·k when sliced)
    val ranked = topKCut(scoredBag, k)
    (cand, ranked)
  }

  /** Flag round 0's survivors: an edge of the first ranked cut is NEW
    * unless it was already present in the init graph `g0`. Incremental
    * rounds (iterateInc) key off this flag. `broadcastG0` follows the
    * callers' GRAPH-side row bound (BroadcastMaxGraphRows) — the init
    * graph is k·N narrow rows, and broadcasting it keeps the flag join
    * off a sorted shuffle of the ranked cut.
    */
  def markNew(ranked: DataFrame, g0: DataFrame, broadcastG0: Boolean = false): DataFrame = {
    val marks = g0.select(col("src"), col("dst")).withColumn("w0", lit(true))
    ranked
      .join(if (broadcastG0) broadcast(marks) else marks, Seq("src", "dst"), "left")
      .withColumn("is_new", col("w0").isNull)
      .drop("w0")
  }

  /** One INCREMENTAL NN-Descent round (Dong et al. §2.2's "local join on
    * new items"): a two-hop pair needs scoring only if at least ONE of
    * its two legs entered the graph in the previous round. Rationale: an
    * old-old pair whose legs ALSO survived the previous round's cap was
    * generated (and scored, and possibly rejected) back then, and the
    * per-src top-k threshold only ever RISES (g ⊆ merged candidates each
    * round), so rescoring it cannot change the graph. With the ρ-cap the
    * skip is a mild approximation — an old-old pair whose leg was
    * cap-excluded last round but cap-included now is skipped even though
    * it was never scored — the same approximation Dong et al.'s own
    * ρ-sampling accepts; the q196 audit certifies recall at the shipped
    * (cap, rounds) config. Input `g` is the previous round's ranked cut
    * carrying the per-edge `is_new` flag (round 0 via iterate + markNew);
    * old edges' scores ride along from `g` itself, so the expensive
    * vector join touches ONLY the new-leg candidate pairs — a shrinking
    * fraction of the full two-hop set as rounds converge.
    *
    * Returns (newCandidates, ranked): the round's NEWLY SCORED pair set
    * (distinct, minus pairs already in the graph) and the merged top-k
    * cut with the next round's `is_new` flags. The q196 audit reports
    * n_cand from the first element, so the audit's candidate-volume
    * column measures exactly what this round paid for.
    */
  def iterateInc(g: DataFrame, vecs: DataFrame, k: Int, cap: Int = -1,
      broadcastVecs: Boolean = false, broadcastGraph: Boolean = false,
      round: Int = 0, slices: Int = 0): (DataFrame, DataFrame) = {
    val capN = if (cap > 0) cap else 2 * k
    // undirected capped adjacency as in `iterate` (the same round-salted
    // md5-rank sample — see iterate's scaladoc: a fresh draw per round is
    // what lets every neighbor eventually join the local join) — plus
    // the edge flag, OR-merged when both directions exist
    val und = g.select(col("src"), col("dst"), col("is_new"))
      .union(g.select(col("dst").as("src"), col("src").as("dst"), col("is_new")))
      .groupBy("src", "dst").agg(max(col("is_new")).as("is_new"))
      .withColumn("rk", row_number().over(Window.partitionBy("src").orderBy(
        Md5Long60.column(concat_ws("_",
          lit("nndr"), lit(round), col("src"), col("dst"))).asc,
        col("dst").asc)))
      .filter(col("rk") <= capN)
      .select("src", "dst", "is_new")
    // new-leg candidate BAG (duplicates allowed — see iterate); pairs
    // already in the graph carry their score in `g` and are never
    // rescored (the anti-join also keeps the next union free of
    // (src,dst) collisions, which the dense_rank dedup relies on). The
    // graph side is k·N narrow rows; it rides its OWN row bound
    // (BroadcastMaxGraphRows via the caller's broadcastGraph), not the
    // vector guard — see the bound's scaladoc.
    val gPairs = {
      val p = g.select("src", "dst")
      if (broadcastGraph) broadcast(p) else p
    }
    val newCandBag = und.alias("a")
      .join(und.alias("b"),
        col("a.dst") === col("b.src") && col("b.dst") =!= col("a.src") &&
          (col("a.is_new") || col("b.is_new")))
      .select(col("a.src").as("src"), col("b.dst").as("dst"))
      .join(gPairs, Seq("src", "dst"), "left_anti")
    // the SET, for the audit's volume count only (oracle c$t is DISTINCT)
    val newCand = newCandBag.distinct()
    // Scoring, regime-split exactly as in `iterate`: broadcast keeps the
    // narrow anti-joined bag + map-side vector joins; shuffle scores the
    // new-leg two-hop expansion at the pivot (the new-leg predicate rides
    // INTO the pivot join) and anti-joins the already-narrow scored
    // triples against gPairs AFTER — same pairs survive, same cos values,
    // and the expensive frame never carries a vector payload. Scoring a
    // pair the anti-join then drops costs only its in-join projection;
    // nothing wide hits a shuffle either way.
    val slicesEff =
      if (broadcastVecs) 1
      else if (slices >= 1) slices
      else math.max(1, ExpansionSlices)
    val scored =
      if (broadcastVecs) scoreFlat(newCandBag, vecs, bcastVecs = true)
      else if (slicesEff == 1)
        scoreTwoHopLocal(und.select("src", "dst", "is_new"), vecs,
          extraCond = col("a.is_new") || col("b.is_new"))
          .join(gPairs, Seq("src", "dst"), "left_anti")
      else
        // bounded-peak-disk slices (see ExpansionSlices / iterate); the
        // per-slice cut is a superset of each pair's final rank
        // eligibility, and the anti-join applies per slice so the union
        // stays (src, dst)-collision-free against g
        (0 until slicesEff).map { sl =>
          CheckpointStats.freshCheckpoint(topKCut(
            scoreTwoHopLocal(und.select("src", "dst", "is_new"), vecs,
              extraCond = col("a.is_new") || col("b.is_new"),
              slice = sl, slices = slicesEff)
              .join(gPairs, Seq("src", "dst"), "left_anti"), k)
            .select("src", "dst", "cos_sim"))
        }.reduce(_.unionByName(_))
    // dense_rank over the bag ≡ row_number over the set (see iterate);
    // g's rows are distinct and anti-joined away from scored, so the
    // only (src,dst) collisions are scored-side duplicates, which agree
    // on every column including is_new
    val ranked = g.select("src", "dst", "cos_sim").withColumn("is_new", lit(false))
      .unionByName(scored.withColumn("is_new", lit(true)))
      .withColumn("rank", dense_rank().over(
        Window.partitionBy("src").orderBy(col("cos_sim").desc, col("dst").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .distinct()
    (newCand, ranked)
  }

  /** INCREMENTAL GRAPH MAINTENANCE (the production ingest shape): insert
    * a batch of new vectors into a previously-built ranked graph without
    * rebuilding it. Each new node gets k deterministic md5 seed edges
    * into the MERGED id space (salt "nndu" — disjoint from the build's
    * "nnd0" draws, so re-running a build never aliases an upsert), the
    * seeds are scored and merged with the base graph flagged `is_new`,
    * and `rounds` incremental local-join rounds (iterateInc) propagate:
    * round 1 already scores old→new pairs (a new node's seed edge
    * reversed exposes its neighborhood to the old side) and new→new
    * pairs mix in as the rounds converge. Cost per round is bounded by
    * the NEW-leg two-hop set — proportional to the batch's neighborhood,
    * not the corpus (the audit-measured shrinking-volume property of
    * iterateInc) — which is the whole point: a rebuild pays O(N·cap²)
    * per round, an upsert pays O(batch·cap²).
    *
    * `baseGraph` is a previous knnGraph/upsertGraph result (src, dst,
    * cos_sim, ...) whose src ids are disjoint from `newVectors`'s ids;
    * `vectors` is the MERGED corpus (base ∪ new). Old edges keep their
    * scores (never rescored); old neighbors get DISPLACED when a new
    * vector out-ranks them — real maintenance, not append-only. Returns
    * the merged ranked edge list (src, dst, cos_sim, rank <= k).
    *
    * Determinism: seed draws are content-stable md5 arithmetic over the
    * dense merged id space (the initGraph convention) and every rank cut
    * shares iterate's total order — the whole upsert reproduces
    * bit-for-bit from SQL (the q203 oracle unrolls this recurrence).
    */
  def upsertGraph(
      baseGraph: DataFrame,
      vectors: DataFrame,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rounds: Int,
      cap: Int = -1
  ): DataFrame = {
    val vecs = CheckpointStats.freshCheckpoint(vecFrame(vectors, idCol, vecCol))
    // same two-bound guard policy as knnGraph (vector payloads vs narrow
    // graph relations), decided from the merged materialized count;
    // rounds <= 0 derives the count from merged N (autoIters — the h10
    // probe showed the 4-round upsert's new nodes beating the 3-round
    // rebuild's at a quarter of the wall)
    val nAll = vecs.count()
    val nRounds = if (rounds >= 1) rounds else autoIters(nAll)
    // k == 0 / cap == 0 derive from MERGED N (knnGraph's convention) —
    // the derived width may exceed the base graph's build width by a
    // little near an autoK breakpoint, which is safe: old lists simply
    // hold <= base-k edges until new candidates fill the wider cut.
    // When k derives, ANY cap <= 0 derives too (round-15 advice): the
    // legacy cap = -1 default must not silently pair a derived width
    // with the uncapped-2k legacy sample no oracle models.
    val kUse = if (k >= 1) k else autoK(nAll)
    val capUse = if (cap > 0) cap else if (cap == 0 || k < 1) autoCap(kUse) else cap
    val bcastVecs = nAll <= BroadcastMaxVecRows
    val bcastGraph = kUse.toLong * nAll <= BroadcastMaxGraphRows
    val slicesUse = deriveSlices(vecs, nAll, capUse, bcastVecs)
    val nRow = vectors.agg(count(lit(1)).as("n"))
    val seeds = newVectors.select(col(idCol).cast("long").as("src"))
      .crossJoin(broadcast(nRow))
      .select(col("src"), col("n"), explode(sequence(lit(1L), lit(kUse.toLong))).as("i"))
      .withColumn("dst", pmod(
        Md5Long60.column(concat_ws("_", lit("nndu"), col("src"), col("i"))),
        col("n")))
      .filter(col("dst") =!= col("src"))
      .select("src", "dst")
      .distinct()
    // flat-scored: batch·k rows — linear in the batch, so one wide sorted
    // shuffle in the shuffle regime is fine (see scoreFlat's scaladoc)
    val seedScored = scoreFlat(seeds, vecs, bcastVecs)
    // merged working graph: base edges ride with their stored scores and
    // is_new = false (their build-time flags are stale by definition);
    // seeds are the new legs. Src sets are disjoint, so the union is
    // (src, dst)-collision-free — the invariant iterateInc's dense_rank
    // dedup relies on.
    var g = CheckpointStats.freshCheckpoint(
      baseGraph.select("src", "dst", "cos_sim").withColumn("is_new", lit(false))
        .unionByName(seedScored.withColumn("is_new", lit(true))))
    var r = 0
    while (r < nRounds) {
      // round salt r + 1: the oracle's upsert unroll indexes upg rounds
      // from t = 1 (t = 0 is the base build's iterate round)
      g = CheckpointStats.freshCheckpoint(
        iterateInc(g, vecs, kUse, capUse, bcastVecs, bcastGraph,
          round = r + 1, slices = slicesUse)._2)
      r += 1
    }
    g.select("src", "dst", "cos_sim", "rank")
  }

  private def log2Ceil(n: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n) - 1)

  /** NN-Descent's two corpus-scaled knobs, derived from N (round-15
    * calibration at 50k near-uniform vectors — the worst case for the
    * recurrence, no cluster structure to exploit; SCALE.md round 15):
    *
    *   - ROUNDS alone cannot fix a fixed working width: at k = 20 the
    *     50k build plateaus at recall@3 ~0.60 by round 8 (0.246 at the
    *     previously shipped 3), and widening the ρ-cap to ρ = 1 made it
    *     WORSE at equal rounds (0.543) for more cost. Round-salting the
    *     ρ-sample (Dong et al. draw fresh every iteration) lifted the
    *     plateau only +0.01 — the ceiling is the WIDTH, not staleness.
    *   - k is the lever: at 50k (salted, cap = 0.7·2k) k = 32 plateaus
    *     at 0.890 while k = 40 CROSSES 0.9 at round 4 (0.928) and reads
    *     0.950 at round 5, 0.956 plateau. NN-Descent's own paper scales
    *     sampled neighborhoods ~log N on hard data.
    *
    * So: autoK = max(20, ceil(2.5·log2 N)) — 20 up to ~256 (the audited
    * small-corpus regime), 23 at 500, 28 at 2k, 40 at 50k, 53 at 2M,
    * 75 at 1B; autoIters = max(3, ceil(log2 N / 3.2)) — 3 up to ~512,
    * 4 at 2k, 5 at 50k (one round past the measured 0.9 crossing),
    * 7 at 2M, 10 at 1B. Per-round cost is N·cap² = N·(1.4·autoK)² —
    * the k² growth is the honest price of recall on structure-less
    * data; clustered corpora (the realistic regime) converge earlier
    * AND higher — round-16 calibration on a 200-cluster 50k mixture:
    * the derived config reads 0.998 at its own pick (0.989 by round 3)
    * and even the quarter-cost k = 20 / cap = 28 config reads 0.960
    * where it plateaus at 0.600 on uniform data — so these formulas
    * are a FLOOR calibration; deployments that measure structure can
    * halve k. The incremental rounds' candidate volume shrinks as the
    * graph converges, so late rounds cost little (h10: rounds 6-8 cost
    * 6-9 s vs 32-53 s for rounds 1-4 at k = 40; h120: round 7 costs
    * 185 s vs round 1's 1061 s). At 12× the calibration N the floor
    * regime loses ground (600k uniform: 0.800 at the derived pick —
    * SCALE.md round 16); structured corpora hold near 1.0. The
    * registry builds pass k = 0 / iters = 0 / cap = 0 and the
    * generated oracles unroll the SAME formulas from the primed corpus
    * count, so both engines walk one recurrence at every scale.
    */
  def autoIters(n: Long): Int =
    math.max(3, math.ceil(log2Ceil(n) / 3.2).toInt)

  /** Working neighbor-list width ~ 2.5·log2 N (floor 20, the audited
    * small-corpus config). See autoIters' scaladoc for the calibration.
    */
  def autoK(n: Long): Int =
    math.max(20, math.ceil(2.5 * log2Ceil(n)).toInt)

  /** Undirected ρ-sample cap for a width (ρ = 0.7, the round-12 audited
    * trade: candidate volume scales with cap² while convergence degrades
    * only gradually below ρ = 1).
    */
  def autoCap(k: Int): Int = math.max(1, math.round(0.7 * 2 * k).toInt)

  /** The composed builder: init + `iters` refinement rounds, each cut
    * from lineage with a stats-reset checkpoint. Round 0 scores the full
    * two-hop ∪ init set (every edge is new); later rounds run the
    * incremental local join (iterateInc). `iters <= 0` / `k <= 0` /
    * `cap <= 0` derive the round count, working width, and ρ-cap from
    * the corpus size (autoIters / autoK / autoCap — the shipped
    * registry configuration). Returns the final ranked edge list
    * (src, dst, cos_sim, rank <= k).
    */
  def knnGraph(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      cap: Int = -1
  ): DataFrame = {
    val vecs = CheckpointStats.freshCheckpoint(vecFrame(vectors, idCol, vecCol))
    // size guards for the per-round scoring joins: the checkpoint above
    // resets stats (correct for the graph frames, whose self-joins must
    // never broadcast), so Catalyst cannot see that the vector table is
    // tiny next to the N·cap² candidate pairs — decide here from the
    // materialized count (the frame is already checkpointed; the count
    // reads cached blocks). The graph-side frames (k·N narrow rows) get
    // their OWN bound: near the vector-guard boundary they are 10M-row
    // HashedRelations that must not pile on top of the vector broadcasts.
    val nVecs = vecs.count()
    val nIters = if (iters >= 1) iters else autoIters(nVecs)
    // k == 0 derives the working width from N; cap == 0 derives the
    // ρ-cap from that width (the shipped registry mode). cap < 0 keeps
    // the legacy "2k uncapped-in-expectation" default ONLY for
    // direct/spec callers with an explicit k — when k derives, any
    // cap <= 0 derives too (round-15 advice: the asymmetric sentinel
    // could silently build a derived-width/ρ=1 config no oracle models).
    val kUse = if (k >= 1) k else autoK(nVecs)
    val capUse = if (cap > 0) cap else if (cap == 0 || k < 1) autoCap(kUse) else cap
    val bcastVecs = nVecs <= BroadcastMaxVecRows
    val bcastGraph = kUse.toLong * nVecs <= BroadcastMaxGraphRows
    val slicesUse = deriveSlices(vecs, nVecs, capUse, bcastVecs)
    val g0 = CheckpointStats.freshCheckpoint(initGraph(vectors, idCol, kUse))
    var g = CheckpointStats.freshCheckpoint(
      markNew(iterate(g0, vecs, kUse, capUse, bcastVecs, slices = slicesUse)._2,
        g0, broadcastG0 = bcastGraph))
    var iter = 1
    while (iter < nIters) {
      // round salt = the oracle's unroll index t (iterate above is t = 0)
      g = CheckpointStats.freshCheckpoint(
        iterateInc(g, vecs, kUse, capUse, bcastVecs, bcastGraph,
          round = iter, slices = slicesUse)._2)
      iter += 1
    }
    g.select("src", "dst", "cos_sim", "rank")
  }

  /** Slice count for the composed builders: the explicit override if
    * set (A/Bs, probes), else autoSlices from (N, cap, measured vector
    * width, disk budget). Broadcast-regime builds never slice — the
    * expansion is never materialized to disk there — so the dimension
    * lookup (one row off the already-checkpointed vecs frame) is paid
    * only past the broadcast boundary, where a build costs minutes and
    * the lookup costs milliseconds. The derived default must be the
    * plan that survives: round 16's unsliced 600k pass died at ~95 GB
    * while the S the formula picks (3) completed at 44 GB peak.
    */
  private def deriveSlices(vecs: DataFrame, n: Long, cap: Int,
      bcastVecs: Boolean): Int =
    if (bcastVecs) 1
    else ExpansionSlicesOverride.getOrElse {
      val dim = vecs.select(size(col("dv")))
        .limit(1).collect().headOption.map(_.getInt(0)).getOrElse(0)
      autoSlices(n, cap, dim)
    }
}
