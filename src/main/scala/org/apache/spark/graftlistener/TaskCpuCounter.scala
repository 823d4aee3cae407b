package org.apache.spark.graftlistener

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Accumulates `executorCpuTime` across task ends: a wall-clock-
  * interference-resistant "work" measure shared by the benchmark
  * mains ([[graft.Bench]], [[graft.tools.SubmitScaling]]).
  *
  * `onTaskEnd` events are delivered asynchronously after an action
  * returns, so both `reset()` and `readSec()` drain the listener bus
  * first — without the drain one trial's CPU time bleeds into the
  * next trial's counter. Callers on a session that outlives the
  * measurement MUST `remove()` the counter (a leaked listener keeps
  * dispatching on every later task end for the session's lifetime).
  */
final class TaskCpuCounter private (sc: SparkContext) {
  private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
  private val listener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
  }

  /** Drain pending events, then zero the counter. */
  def reset(): Unit = { drainListenerBus(sc); cpuNs.set(0L) }

  /** Drain pending events, then read the accumulated CPU seconds. */
  def readSec(): Double = { drainListenerBus(sc); cpuNs.get() / 1e9 }

  /** Detach from the context; the counter stops accumulating. */
  def remove(): Unit = sc.removeSparkListener(listener)
}

object TaskCpuCounter {
  /** Install a fresh counter on `sc`; starts at zero. */
  def install(sc: SparkContext): TaskCpuCounter = {
    val c = new TaskCpuCounter(sc)
    sc.addSparkListener(c.listener)
    c
  }
}
