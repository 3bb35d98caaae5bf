package org.apache.spark.sql.graft

/** Bridge to Spark's priority-ordered shutdown-hook manager
  * (`org.apache.spark.util.ShutdownHookManager`, `private[spark]` — hence
  * this shim living in the org.apache.spark tree). Unlike raw
  * `Runtime.addShutdownHook` threads (which all start concurrently, with
  * no ordering vs Spark's own teardown), hooks registered here run inside
  * Spark's single ordered hook: HIGHER priority runs FIRST, so a
  * low-priority hook is guaranteed to run AFTER SparkContext's stop hook
  * (priority 50) and its shutdown log noise. The bench uses this to emit
  * a provisional result line as the process's last words when an external
  * kill (driver timeout, SIGTERM) lands before the normal end-of-run
  * print — mirroring how the reference's harness persists partial CSVs on
  * interrupt (reference/src/data_derivation/query_performance/
  * benchmark_functions.py:51-106).
  */
object GraftShutdownHooks {

  /** Registers `body` at the given priority (SparkContext stops at 50;
    * pass something below that to run after Spark teardown). Returns a
    * handle for [[remove]]. */
  def add(priority: Int)(body: => Unit): AnyRef =
    org.apache.spark.util.ShutdownHookManager.addShutdownHook(priority) { () =>
      body
    }

  def remove(handle: AnyRef): Boolean =
    org.apache.spark.util.ShutdownHookManager.removeShutdownHook(handle)
}
