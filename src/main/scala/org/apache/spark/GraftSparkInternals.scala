package org.apache.spark

/** Narrow access shims for `private[spark]` members Bench instrumentation
  * needs (VERDICT r12 #1: per-pass executor-side work metrics require the
  * listener bus drained before each counter snapshot, and
  * [[org.apache.spark.scheduler.LiveListenerBus.waitUntilEmpty]] is
  * `private[spark]`). Kept to the minimum surface: one drain call. No
  * behavior is modified — this only waits for already-queued events.
  */
object GraftSparkInternals {
  /** Block until every queued listener event is dispatched (or timeout).
    * Returns false on timeout — callers treat the following counter
    * snapshot as approximate rather than failing the run.
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
