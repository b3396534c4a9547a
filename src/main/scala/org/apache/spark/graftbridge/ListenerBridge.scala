package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Minimal bridge into `private[spark]` listener-bus plumbing, for the one
  * place a benchmark needs a DETERMINISTIC listener drain: shuffle-byte
  * tallies collected via `SparkListener` are delivered asynchronously, and
  * a fixed sleep can silently undercount on a loaded VM (ADVICE r5). The
  * engine itself never uses this — measurement harnesses only.
  */
object ListenerBridge {
  /** Block until every event posted so far has been delivered to all
    * registered listeners (or the timeout elapses, which throws). */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
