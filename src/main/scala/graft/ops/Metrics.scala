package graft.ops

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Aggregating SparkListener — the per-operator latency/IO observability
  * surface the reference exports as Prometheus counters and duration
  * histograms per pipeline stage (reference: extractor/main.go:69-87,
  * transformer/transformer.py:65-82). On Spark the equivalent signal lives in
  * task metrics, so this listener folds every completed task into monotonic
  * counters; callers snapshot before/after a query and diff to get that
  * query's task count, executor time, shuffle volume, spill and input bytes.
  *
  * Listener events are delivered asynchronously on the listener-bus thread,
  * so [[quiesce]] polls until the counters stop moving before snapshotting —
  * public-API-only (no private listener-bus flush), bounded wait.
  */
object QueryMetricsListener {
  /** Monotonic totals since registration. `diff` two snapshots for a window. */
  final case class Snapshot(
      tasks: Long,
      taskTimeMs: Long,
      cpuTimeMs: Long,
      gcTimeMs: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      spillBytes: Long,
      inputBytes: Long,
      peakExecutionMemory: Long) {
    def diff(before: Snapshot): Snapshot = Snapshot(
      tasks - before.tasks,
      taskTimeMs - before.taskTimeMs,
      cpuTimeMs - before.cpuTimeMs,
      gcTimeMs - before.gcTimeMs,
      shuffleReadBytes - before.shuffleReadBytes,
      shuffleWriteBytes - before.shuffleWriteBytes,
      spillBytes - before.spillBytes,
      inputBytes - before.inputBytes,
      // peak is a high-water mark, not a counter — report the window max as-is
      peakExecutionMemory)
  }
}

final class QueryMetricsListener extends SparkListener {
  import QueryMetricsListener.Snapshot

  private val tasks = new LongAdder
  private val taskTimeMs = new LongAdder
  private val cpuTimeNs = new LongAdder
  private val gcTimeMs = new LongAdder
  private val shuffleReadB = new LongAdder
  private val shuffleWriteB = new LongAdder
  private val spillB = new LongAdder
  private val inputB = new LongAdder
  private val peakMem = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      tasks.increment()
      taskTimeMs.add(m.executorRunTime)
      cpuTimeNs.add(m.executorCpuTime)
      gcTimeMs.add(m.jvmGCTime)
      shuffleReadB.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteB.add(m.shuffleWriteMetrics.bytesWritten)
      spillB.add(m.memoryBytesSpilled + m.diskBytesSpilled)
      inputB.add(m.inputMetrics.bytesRead)
      peakMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
    }
  }

  /** Reset the peak-memory high-water mark at a window boundary so the next
    * snapshot's peak reflects only tasks completed since this call.
    */
  def resetPeak(): Unit = peakMem.set(0L)

  def snapshot(): Snapshot = Snapshot(
    tasks.sum(), taskTimeMs.sum(), cpuTimeNs.sum() / 1000000L, gcTimeMs.sum(),
    shuffleReadB.sum(), shuffleWriteB.sum(), spillB.sum(), inputB.sum(),
    peakMem.get())

  /** Snapshot once the async listener bus has drained: poll until two reads
    * `stableForMs` apart agree, give up after `maxWaitMs` (the counters are
    * monotonic, so a late event only shifts cost into the next window — never
    * double-counts).
    */
  def quiesce(maxWaitMs: Long = 2000, stableForMs: Long = 50): Snapshot = {
    var prev = snapshot()
    var waited = 0L
    while (waited < maxWaitMs) {
      Thread.sleep(stableForMs)
      waited += stableForMs
      val cur = snapshot()
      if (cur == prev) return cur
      prev = cur
    }
    prev
  }
}
