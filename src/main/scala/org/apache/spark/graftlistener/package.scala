package org.apache.spark

/** Minimal bridge into `private[spark]` scheduler internals: the
  * listener bus drain. Benchmarks that read SparkListener-accumulated
  * task metrics must drain the async event queue before sampling —
  * `onTaskEnd` events are delivered asynchronously after a job's
  * action returns, so without a drain, one trial's CPU time bleeds
  * into the next trial's counter. Lives in `org.apache.spark` solely
  * for access; no Spark internals are modified.
  */
package object graftlistener {
  /** Block until all queued listener events are delivered (or the
    * timeout elapses). Returns true if the bus fully drained. */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 10000L): Boolean = {
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
  }
}
