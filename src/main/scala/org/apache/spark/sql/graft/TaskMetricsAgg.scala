package org.apache.spark.sql.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Sums task-level disk-spill and shuffle-write bytes across a measured
  * region — the instrument behind SCALE.md's spill columns. Round 15
  * established that the NND shuffle regime's binding resource is DISK
  * (~N·cap²·rowWidth of spill, measured only as "the run died when /tmp
  * filled"); this turns that into a number the probes record per arm /
  * per round instead of an autopsy. Lives in an org.apache.spark
  * subpackage for `listenerBus.waitUntilEmpty()` (private[spark]) so a
  * snapshot can flush in-flight task-end events instead of sleeping.
  *
  * Lifecycle: the constructor registers the listener; call close()
  * when the measured region ends. Instantiating one per region in a
  * long-lived session without closing stacks listeners and
  * double-counts (round-16 advice; current probe usage is one per
  * JVM, but the contract is now explicit and enforceable).
  */
final class TaskMetricsAgg(sc: SparkContext) extends SparkListener with AutoCloseable {
  private val spill = new AtomicLong(0L)
  private val shufWrite = new AtomicLong(0L)
  sc.addSparkListener(this)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      spill.addAndGet(m.diskBytesSpilled)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  /** Flush pending listener events, return (spillBytes,
    * shuffleWriteBytes) accumulated since the last reset, and zero the
    * counters. getAndSet keeps read-and-reset atomic per counter: a
    * task-end delivered between a plain get and set(0) would be
    * silently dropped (round-16 advice).
    */
  def snapshotAndReset(): (Long, Long) = {
    sc.listenerBus.waitUntilEmpty()
    (spill.getAndSet(0L), shufWrite.getAndSet(0L))
  }

  /** Deregister from the listener bus. */
  override def close(): Unit = sc.removeSparkListener(this)
}
