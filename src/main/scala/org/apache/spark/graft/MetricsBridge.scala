package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench's CPU-time gate (BASELINE.md's host-noise-invariant flag
  * discipline) needs deterministic task-metric attribution: task-end
  * events ride the async listener bus, so a per-query CPU delta read
  * before the bus drains could credit one query's tasks to the next.
  * `LiveListenerBus.waitUntilEmpty` is the canonical sync point —
  * Spark's own test harness calls it for exactly this reason — but it
  * is `private[spark]`, so this one-file shim lives inside the
  * `org.apache.spark` package tree, same pattern as
  * sql/graft/ColumnBridge.
  */
object MetricsBridge {
  /** Block until every queued listener event is delivered, or
    * `timeoutMillis` elapses. Returns false on timeout — callers
    * degrade to slightly-misattributed metrics rather than abort a
    * 4-minute bench over a straggling event.
    */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
