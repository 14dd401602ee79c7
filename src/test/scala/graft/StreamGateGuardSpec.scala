package graft

import graft.streaming.StreamMetrics

/** Regression guard for the round-7 streaming pathology: every
  * (state partition x store instance) pays a fixed commit/coordinator
  * cost per micro-batch, so state-commit time at the session's default
  * 128 shuffle partitions reached 86-295 s per gate — 10-30x the actual
  * addBatch compute — until runStreamGate pinned state partitions to 8.
  * This spec runs each STATEFUL gate (the foreachBatch bridges carry no
  * state operators) and fails if summed state-commit time ever exceeds a
  * generous fixed floor + multiple of addBatch again: the pathological
  * regime sits far above this bound at every scale, normal runs far
  * below it.
  */
class StreamGateGuardSpec extends SparkSpec {

  private val statefulGates = Seq(
    "q53_events_hourly_stream",
    "q71_stream_dedup",
    "q84_stream_sessions",
    "q90_stream_static_join",
    "q94_stream_user_totals",
    "q95_stream_stream_join")

  test("stateful gates: state-commit time stays within bounds of addBatch") {
    for (gate <- statefulGates) {
      StreamMetrics.drain() // discard anything a previous test recorded
      SparkEntry.queries(gate)(spark, "/root/testdata/sf0.001").collect()
      val stats = StreamMetrics.drain()
      assert(stats.nonEmpty, s"$gate drained without recording StreamMetrics")
      for ((name, st) <- stats) {
        assert(st.batches > 0 && st.inputRows > 0,
          s"$gate/$name recorded no batches/rows — the guard would be vacuous")
        assert(st.stateRows > 0,
          s"$gate/$name recorded no state rows — gate is not actually stateful")
        // the pathology's cost is PER MICRO-BATCH (a fixed per-store-
        // instance commit overhead each batch), so scale the fixed
        // allowance with batch count instead of one wall-clock constant:
        // less spurious on a loaded machine, still an order of magnitude
        // under the 86-295 s pathological regime
        val bound = 4000L + 3000L * st.batches + 4L * st.addBatchMs
        assert(st.stateCommitMs <= bound,
          s"$gate/$name state commit ${st.stateCommitMs} ms exceeds $bound ms " +
            s"(addBatch ${st.addBatchMs} ms) — the per-store-instance commit " +
            "pathology is back; check the state-partition pin in runStreamGate")
      }
    }
  }
}
