package graft.util

import java.util.concurrent.{Executors, ThreadFactory}
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.duration.{Duration, DurationInt}
import scala.concurrent.{Await, ExecutionContext, Future}

/** Driver-side concurrent-job submission (ADVICE r9): several entries
  * submit independent Spark actions as concurrent jobs (q128's three
  * graph builds, q129's seven sweep legs, q130's three CC runs,
  * IncrementalNearDup's three state appends). Spark actions BLOCK their
  * pool thread for the whole job, so running them on
  * `ExecutionContext.Implicits.global` both starves the shared global
  * pool for any other user and is itself throttled by it; and
  * `Await.result(…, Duration.Inf)` turns a wedged job into a silent
  * forever-hang. This pool is dedicated (daemon threads, so a hung job
  * never blocks JVM exit) and every await carries a finite deadline
  * with a descriptive failure.
  */
object Jobs {

  /** Sized for "a handful of concurrent actions per entry": the widest
    * current fan-out is q129's 7 legs; each action is a full Spark job
    * that parallelizes internally, so more threads here would only
    * queue scheduler work, not add throughput. */
  private val PoolSize = 8

  implicit lazy val ec: ExecutionContext = ExecutionContext.fromExecutor(
    Executors.newFixedThreadPool(PoolSize, new ThreadFactory {
      private val n = new AtomicInteger
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-jobs-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    }))

  private val groupSeq = new AtomicInteger

  /** Run `thunks` as concurrent Spark jobs and await all, failing with
    * `what` in the message if the batch exceeds `timeout` (a wedged
    * executor should fail the query with a diagnosis, not hang it).
    *
    * Each thunk runs under a per-call job group (set on the pool thread
    * — job groups are thread-local) so that on timeout the in-flight
    * Spark actions are CANCELLED, not abandoned: a wedged batch must not
    * keep contending with whatever the caller runs next (ADVICE r10). */
  def awaitAll[T](what: String, timeout: Duration = 10.minutes)(
      thunks: Seq[() => T]): Seq[T] = {
    val sessOpt = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
    val scOpt = sessOpt.map(_.sparkContext)
    val group = s"graft-jobs-${groupSeq.incrementAndGet()}"
    val fs = thunks.map(t => Future {
      // pin the CALLER's session on the pool thread before the thunk
      // builds any plan: pool threads inherit whatever active session
      // (possibly none, possibly a dead stream clone) their creating
      // thread happened to carry — see graft.util.Sessions
      sessOpt.foreach(Sessions.ensureActive)
      scOpt.foreach(_.setJobGroup(group, what, interruptOnCancel = true))
      try t() finally scOpt.foreach(_.clearJobGroup())
    }(ec))
    try Await.result(Future.sequence(fs)(implicitly, ec), timeout)
    catch {
      case e: java.util.concurrent.TimeoutException =>
        scOpt.foreach(_.cancelJobGroup(group))
        throw new RuntimeException(
          s"concurrent jobs for $what did not complete within $timeout", e)
    }
  }
}
