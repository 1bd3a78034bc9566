package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-query execution metrics snapshot (plankton's run-monitoring
  * surface, SURVEY.md §2e "run-history DB" row — VERDICT r3 #4): the
  * numbers an operator of this engine reads first when a query slows
  * down. All byte counts are sums over the query's completed stages;
  * peak memory is the max single-stage execution-memory peak. */
case class RunMetrics(
    stages: Long,
    shuffleReadBytes: Long,
    shuffleWriteBytes: Long,
    diskSpillBytes: Long,
    memorySpillBytes: Long,
    peakExecutionMemory: Long,
    executorRunMillis: Long,
    executorCpuNanos: Long) {
  /** Fraction of task wall time the threads actually held a core —
    * cpu/run ≈ 1 means the work was real; ≪ 1 means the OS descheduled
    * the executors (external host contention), the signature that
    * separates "this query regressed" from "the box was loaded" in a
    * recorded artifact. -1.0 is the NO-DATA sentinel: a query that ran
    * zero tasks (or whose metrics never arrived) must not read as
    * "fully CPU-bound" in the artifact. */
  def cpuShare: Double =
    if (executorRunMillis <= 0) -1.0
    else (executorCpuNanos / 1e6) / executorRunMillis
}

/**
 * Stage-granular metrics collector. Register ONCE on the SparkContext;
 * call [[snapshotAndReset]] after each query (after draining the
 * listener bus — events are delivered asynchronously, see
 * [[org.apache.spark.graftbridge.ListenerDrain]]).
 *
 * Scale note: this is driver-side O(1) state per stage — the same
 * mechanism the Spark UI and history server use, so it costs nothing
 * the application wasn't already paying; on a 1000-executor cluster the
 * aggregated TaskMetrics arrive with each stage-completed event
 * regardless of whether anyone reads them.
 */
class RunMetricsListener extends SparkListener {
  private var stages = 0L
  private var shuffleRead = 0L
  private var shuffleWrite = 0L
  private var diskSpill = 0L
  private var memSpill = 0L
  private var peakMem = 0L
  private var runMillis = 0L
  private var cpuNanos = 0L

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
    synchronized {
      val m = ev.stageInfo.taskMetrics
      if (m != null) {
        stages += 1
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        diskSpill += m.diskBytesSpilled
        memSpill += m.memoryBytesSpilled
        peakMem = math.max(peakMem, m.peakExecutionMemory)
        runMillis += m.executorRunTime
        cpuNanos += m.executorCpuTime
      }
    }

  def snapshotAndReset(): RunMetrics = synchronized {
    val snap = RunMetrics(stages, shuffleRead, shuffleWrite, diskSpill,
      memSpill, peakMem, runMillis, cpuNanos)
    stages = 0L; shuffleRead = 0L; shuffleWrite = 0L
    diskSpill = 0L; memSpill = 0L; peakMem = 0L
    runMillis = 0L; cpuNanos = 0L
    snap
  }
}
