package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.streaming.StreamingQuery

/** Per-gate rollup of StreamingQueryProgress, recorded when a streaming
  * gate drains and surfaced by Bench into the bench JSON. Motivation
  * (round-7 verdict): the streaming gates' wall-clock swung 1.4-2.4x
  * between identical driver runs while every batch query stayed flat, so
  * the bench needs to print WHERE streaming time goes (micro-batch
  * count, state rows/memory, addBatch vs state-commit time) instead of a
  * bare wall-clock that can't be trusted round over round.
  */
object StreamMetrics {
  /** One drained gate. Durations are summed across micro-batches; state
    * rows/memory are the max across progress events (state grows to its
    * final size, intermediate snapshots are subsets).
    */
  final case class GateStats(
      batches: Int,
      inputRows: Long,
      addBatchMs: Long,
      commitOffsetsMs: Long,
      stateRows: Long,
      stateMemBytes: Long,
      stateCommitMs: Long,
      // per-micro-batch addBatch durations in progress order: lets the
      // batch-0 guard (StreamBatch0Spec) and the bench JSON show WHERE
      // the time went instead of only the sum — round 12's lazy-index
      // defect (the whole corpus build landing in batch 0) was invisible
      // in the summed number
      addBatchPerBatch: Seq[Long] = Seq.empty)

  private val byGate = TrieMap.empty[String, GateStats]

  /** Roll up a finished (or stopping) query's recentProgress. The default
    * progress retention (spark.sql.streaming.numRecentProgressUpdates =
    * 100) far exceeds any gate's batch count (AvailableNow over 1-2
    * staged files), so the rollup sees every batch.
    */
  def record(name: String, q: StreamingQuery): Unit = {
    val ps = q.recentProgress
    def dur(key: String): Long =
      ps.map(p => Option(p.durationMs.get(key)).map(_.longValue).getOrElse(0L)).sum
    val perBatch = ps.toSeq.sortBy(_.batchId)
      .map(p => Option(p.durationMs.get("addBatch")).map(_.longValue).getOrElse(0L))
    val stats = GateStats(
      batches = ps.length,
      inputRows = ps.map(_.numInputRows).sum,
      addBatchMs = dur("addBatch"),
      commitOffsetsMs = dur("commitOffsets") + dur("walCommit"),
      stateRows =
        ps.map(_.stateOperators.map(_.numRowsTotal).sum).maxOption.getOrElse(0L),
      stateMemBytes =
        ps.map(_.stateOperators.map(_.memoryUsedBytes).sum).maxOption.getOrElse(0L),
      stateCommitMs = ps.map(_.stateOperators.map(_.commitTimeMs).sum).sum,
      addBatchPerBatch = perBatch)
    byGate.put(name, stats)
  }

  /** Hand the recorded gates to the caller and reset (Bench drains after
    * each registry query so stats attribute to the query that ran them).
    */
  def drain(): Map[String, GateStats] = {
    val m = byGate.toMap
    byGate.clear()
    m
  }
}
