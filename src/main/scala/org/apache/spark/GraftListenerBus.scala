package org.apache.spark

/** Narrow accessor for the `private[spark]` listener bus drain.
  *
  * The orchestrator's per-run progress/log state is evicted at the
  * start of a re-run; scheduler events ride an ASYNC bus, so without
  * a drain a finished run's straggler events could repopulate the
  * evicted counters and corrupt the next run's progress. Draining at
  * run end (bounded) closes the race. This is the standard pattern
  * for deterministic listener accounting — the API is stable but not
  * public, hence this one-method shim rather than reflection. */
object GraftListenerBus {

  /** Block until all queued listener events are delivered, or the
    * timeout elapses (best effort — a timeout is not an error). */
  def drain(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
