package graft.util

import org.apache.spark.sql.SparkSession

/** Explicit active-session pinning (VERDICT r14 item 1).
  *
  * Spark physical-plan nodes capture `SparkSession.getActiveSession
  * .orNull` at construction, and the active session is an
  * InheritableThreadLocal: a thread created before any session existed
  * (a test-framework dispatcher child, a lazily grown pool thread)
  * carries None forever, and a thread created inside a streaming
  * micro-batch carries that query's CLONED session after the query is
  * gone. Spark's own execution paths guard plan construction with
  * `withActive`, but any plan forced OUTSIDE an action on such a thread
  * is built with a null/stale session — the
  * `SparkPlan.session() is null` NPE the round-14 driver hit in
  * `WidenMigrationSpec` (an internal `resetMetrics` on a plan that had
  * crossed a session boundary). Pinning is idempotent and costs one
  * thread-local read when already pinned.
  */
object Sessions {
  /** Make `s` the calling thread's active session unless it already
    * is. Call at the entry of any code that may run on a thread graft
    * did not just create from a session-bearing parent (state-class
    * public entry points, pool-thread task bodies). */
  def ensureActive(s: SparkSession): Unit =
    if (!SparkSession.getActiveSession.contains(s))
      SparkSession.setActiveSession(s)
}
