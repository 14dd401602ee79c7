package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Stats hygiene for iterative (local)checkpoint loops.
  *
  * `Dataset.checkpoint`/`localCheckpoint` wrap the materialized RDD in a
  * `LogicalRDD` that CARRIES the checkpointed plan's statistics
  * (`originStats`). Catalyst's size-only estimator multiplies child
  * sizes at joins (`SizeInBytesOnlyStatsPlanVisitor.default`), so an
  * iterative loop of the shape
  *
  *   labels = f(labels join labels).localCheckpoint()
  *
  * inherits a size estimate that is (at least) SQUARED every round.
  * The estimate is a `BigInt`; after ~13-25 rounds its bit length
  * crosses java.math.BigInteger's 2^31-bit cap and PLANNING itself
  * throws `ArithmeticException: BigInteger would overflow supported
  * range` — the pointer-jumping dedup-group loops (q52/q91/q192 class)
  * hit exactly this once their input pairs carry default-sized
  * (8 EiB) LogicalRDD leaves and the loop runs enough rounds.
  *
  * `freshCheckpoint` localCheckpoints the frame and re-wraps the
  * materialized RDD WITHOUT origin stats (zero-copy: the physical
  * `toRdd` of a checkpoint scan is the checkpointed RDD itself), so
  * every round restarts from the session default size estimate instead
  * of the inherited product. The default (8 EiB) also keeps the loop's
  * self-joins out of broadcast plans — correct here: label frames are
  * corpus-proportional, never safely broadcastable at scale.
  */
object CheckpointStats {
  /** localCheckpoint + stats reset. Since round 17 the checkpoint's
    * OUTPUT PARTITIONING (and ordering) survive the re-wrap: the
    * checkpoint Dataset's own plan is a LogicalRDD that carries them,
    * and copying it with originStats = None strips exactly the squared
    * size estimate — so an iterative loop whose rounds join the
    * checkpointed frame on its own grouping key no longer re-exchanges
    * a frame that is already hash-partitioned by that key (measured on
    * the q52 resolveGroups loop: the per-round label-side exchanges
    * vanish from the plan). `eager = false` defers materialization to
    * the caller's next action — an iterative loop whose round ends in a
    * convergence count can fold checkpoint materialization into that
    * count instead of paying a separate job.
    */
  def freshCheckpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val cp = ds.localCheckpoint(eager).asInstanceOf[Dataset[Row]]
    val sp = cp.sparkSession.asInstanceOf[SparkSession]
    cp.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        Dataset.ofRows(sp, org.apache.spark.sql.execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(sp, None, None))
      case _ =>
        sp.internalCreateDataFrame(cp.queryExecution.toRdd, cp.schema)
    }
  }
}
