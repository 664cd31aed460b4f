package org.apache.spark

/** Minimal `private[spark]` accessor bridge for the profiling tool:
  * [[graft.Prof]]'s per-run job/task accounting must DRAIN the async
  * listener bus before printing and resetting its counters — a fixed
  * sleep can under- or over-shoot under load (ADVICE r13), skewing
  * per-run attribution. Public Spark API exposes no drain hook, so this
  * one-liner lives in the org.apache.spark package (the GraftSqlBridge
  * pattern). Tooling-only: no query path calls it.
  */
object GraftCoreBridge {
  /** Block until every queued listener event is dispatched, or throw
    * after `timeoutMillis`. */
  def waitListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
