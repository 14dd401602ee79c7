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
  */
final class TaskMetricsAgg(sc: SparkContext) extends SparkListener {
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
    * counters.
    */
  def snapshotAndReset(): (Long, Long) = {
    sc.listenerBus.waitUntilEmpty()
    val r = (spill.get(), shufWrite.get())
    spill.set(0L)
    shufWrite.set(0L)
    r
  }
}
