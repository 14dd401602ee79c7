package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus-scaled 1-in-m spread — THE audit/train sampling convention
  * (q147/q154/q170/q183/q196 and the k-means trainers): m =
  * max(1, N div target), keep ids that are multiples of m. Input size is
  * thereby capped at ~`target` rows at ANY corpus scale, and m = 1 at
  * oracle scales so correctness gates see the full input. Deterministic
  * (no RNG: same corpus -> same sample -> reproducible audits) and
  * expressible in one line of the DuckDB twin
  * (`greatest(1, count(*) // target)` + `id % m = 0`), which is why it
  * is used instead of `df.sample()`.
  *
  * Returns the input's columns plus `m` (several call sites scale seed
  * cutoffs by m, e.g. `id < 8 * m`); drop it if unused. CALL-SITE
  * RESPONSIBILITY: follow with `.localCheckpoint(false)` when expensive
  * per-row work (minhash, simhash, projections) comes next — the
  * checkpoint is a PLAN BARRIER keeping that work above the broadcast-m
  * filter; without it PushProjectionThroughJoin inlines the hashing
  * below the join and processes the ENTIRE corpus for a bounded audit
  * (measured 63 s vs 0.3 s at the 10x corpus in lshTuningAudit).
  *
  * `spreadTo > 0` re-spreads the kept rows across that many partitions
  * — a BOUNDED shuffle (<= ~2x target rows by construction), so safe at
  * any corpus size. Opt in when the sample feeds heavy PER-ROW or
  * PER-PAIR work (shingle md5 + exact containment: q183 2.4 s spread
  * vs 10.3 s on the scan's partitioning); leave 0 when everything
  * downstream is sample-sized frames and iteration (q196's audit got
  * ~25% SLOWER spread wide — 32-way tiny frames are pure scheduling
  * overhead). Either way pass the RAW frame, not a pre-spread one — a
  * corpus-wide repartition BELOW the sampling filter shuffles every
  * row's full payload to keep one in m (measured: q183's h10 audit
  * spent ~6x its bounded cost shuffling 10x corpus text it then
  * discarded).
  */
object Sampling {
  def oneInM(df: DataFrame, idCol: String, target: Long,
      spreadTo: Int = 0): DataFrame = {
    val mRow = df.agg(count(lit(1)).as("n"))
      .select(greatest(lit(1L), expr(s"n div $target")).as("m"))
    val kept = df.crossJoin(broadcast(mRow))
      .filter(col(idCol) % col("m") === 0)
    if (spreadTo > 0) kept.repartition(spreadTo) else kept
  }
}
