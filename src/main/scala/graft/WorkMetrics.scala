package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Load-INDEPENDENT work accounting for one interval of Spark activity:
  * shuffle bytes moved, bytes spilled, tasks launched (VERDICT r6 Next #2).
  *
  * Wall time on a contended host measures the HOST, not the plan — r5/r6
  * both produced official bench artifacts whose times were 10–20× inflated
  * by machine load. These counters are invariant under load: a plan
  * regression (a new exchange, a lost broadcast, a lost pushdown) changes
  * shuffle bytes and task counts on ANY host, thrashed or idle, so the bench
  * artifact carries them per rep alongside wall time. `WorkMetricsSpec`
  * proves the property by A/B-ing a broadcast join against the same join
  * with broadcast disabled and asserting on the shuffle-bytes delta while
  * ignoring wall time entirely.
  *
  * Counters are cumulative for the listener's lifetime; callers take
  * [[snapshot]] deltas around the interval of interest. `snapshot` drains
  * the listener bus first (listener delivery is async — see
  * [[org.apache.spark.graftbench.BusFlush]]), so a snapshot taken after an
  * action has completed includes all of that action's task ends.
  */
final class WorkMetricsListener extends SparkListener {
  private val shuffleRead = new AtomicLong(0L)
  private val shuffleWrite = new AtomicLong(0L)
  private val spillMem = new AtomicLong(0L)
  private val spillDisk = new AtomicLong(0L)
  private val taskCount = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillMem.addAndGet(m.memoryBytesSpilled)
      spillDisk.addAndGet(m.diskBytesSpilled)
      taskCount.incrementAndGet()
      ()
    }
  }

  /** Drain the listener bus, then read the cumulative counters. */
  def snapshot(sc: SparkContext): WorkSnapshot = {
    org.apache.spark.graftbench.BusFlush.flush(sc)
    WorkSnapshot(shuffleRead.get(), shuffleWrite.get(),
      spillMem.get(), spillDisk.get(), taskCount.get())
  }
}

/** Cumulative counter values; subtract two to get an interval's work. */
final case class WorkSnapshot(shuffleReadBytes: Long, shuffleWriteBytes: Long,
                              spillMemBytes: Long, spillDiskBytes: Long,
                              tasks: Long) {
  def -(prev: WorkSnapshot): WorkSnapshot = WorkSnapshot(
    shuffleReadBytes - prev.shuffleReadBytes,
    shuffleWriteBytes - prev.shuffleWriteBytes,
    spillMemBytes - prev.spillMemBytes,
    spillDiskBytes - prev.spillDiskBytes,
    tasks - prev.tasks)
}
