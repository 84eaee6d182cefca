package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Cumulative task-metric counters fed by a [[SparkListener]], snapshotted
  * per bench gate. The point (round-11 verdict item 4): wall-clock spikes in
  * an official run could not be adjudicated from `la1`/`gcMs` alone — a
  * lagging loadavg says nothing about one 3-second gate, and most spiked
  * gates showed `gcMs:0`. Executor CPU time, task time, and shuffle bytes
  * are INVARIANT under external machine load (a loaded box stretches wall
  * time while the gate's own CPU/shuffle stay at-band), so a per-gate
  * artifact row carrying them self-adjudicates: wall up + cpu/shuffle flat
  * = environment; wall up + cpu or shuffle up = plan regression. This is
  * the same signal a cluster operator reads off the Spark UI's stage
  * metrics, captured per gate without the UI.
  */
final class TaskMetricsCollector extends SparkListener {
  private val cpuNs = new AtomicLong
  private val runMs = new AtomicLong
  private val shufReadB = new AtomicLong
  private val shufWriteB = new AtomicLong
  private val spillB = new AtomicLong
  private val tasks = new AtomicLong

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      cpuNs.addAndGet(m.executorCpuTime)
      runMs.addAndGet(m.executorRunTime)
      shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      spillB.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      tasks.incrementAndGet()
    }
  }

  /** Monotone counter snapshot: (cpuMs, taskMs, shufReadB, shufWriteB,
    * spillB, tasks). Callers diff two snapshots around a gate; drain the
    * listener bus at BOTH edges (Shim.drainListenerBus) or late task-end
    * events smear across gates.
    */
  def snapshot(): TaskMetricsCollector.Snap = TaskMetricsCollector.Snap(
    cpuNs.get / 1000000L, runMs.get, shufReadB.get, shufWriteB.get, spillB.get, tasks.get)
}

object TaskMetricsCollector {
  final case class Snap(cpuMs: Long, taskMs: Long, shufReadB: Long,
      shufWriteB: Long, spillB: Long, tasks: Long) {
    def -(o: Snap): Snap = Snap(cpuMs - o.cpuMs, taskMs - o.taskMs,
      shufReadB - o.shufReadB, shufWriteB - o.shufWriteB, spillB - o.spillB,
      tasks - o.tasks)
    def json: String =
      s"""{"cpuMs":$cpuMs,"taskMs":$taskMs,"shufReadB":$shufReadB,"shufWriteB":$shufWriteB,"spillB":$spillB,"tasks":$tasks}"""
  }

  /** Install on the context and return a snapshot function that drains the
    * bus before reading — the only correct way to take a gate-edge reading.
    */
  def install(sc: SparkContext): () => Snap = {
    val c = new TaskMetricsCollector
    sc.addSparkListener(c)
    () => {
      org.apache.spark.sql.graft.Shim.drainListenerBus(sc)
      c.snapshot()
    }
  }
}
