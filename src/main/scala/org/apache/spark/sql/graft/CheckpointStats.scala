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
  def freshCheckpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val cp = ds.localCheckpoint(eager).asInstanceOf[Dataset[Row]]
    val sp = cp.sparkSession.asInstanceOf[SparkSession]
    sp.internalCreateDataFrame(cp.queryExecution.toRdd, cp.schema)
  }
}
