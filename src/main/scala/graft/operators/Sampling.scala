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
  * The kept rows are re-spread across the session's parallelism: the
  * hash-heavy work that always follows must not run single-core just
  * because the sample collapsed into few scan partitions. The shuffle
  * is BOUNDED (<= ~2x target rows by construction), so this is safe at
  * any corpus size. Pass the RAW frame, not a pre-spread one — a
  * corpus-wide repartition BELOW the sampling filter shuffles every
  * row's full payload to keep one in m (measured: q183's h10 audit
  * spent ~6x its bounded cost shuffling 10x corpus text it then
  * discarded).
  */
object Sampling {
  def oneInM(df: DataFrame, idCol: String, target: Long): DataFrame = {
    val mRow = df.agg(count(lit(1)).as("n"))
      .select(greatest(lit(1L), expr(s"n div $target")).as("m"))
    df.crossJoin(broadcast(mRow)).filter(col(idCol) % col("m") === 0)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
  }
}
