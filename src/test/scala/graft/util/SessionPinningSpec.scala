package graft.util

import graft.SparkTestSession
import graft.queries.LlmText
import graft.streaming.IncrementalNearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r14 item 1 — the WidenMigrationSpec driver flake: Spark
  * physical-plan nodes capture the thread's ACTIVE session at
  * construction (null when none), and threads graft does not control
  * (test-framework dispatch children, lazily created pool threads) can
  * carry an empty or stale InheritableThreadLocal. These drills run the
  * exact code path the driver flaked on from a deliberately
  * session-less thread and pin the [[Jobs]]/[[Sessions]] contract: no
  * plan object crosses a session boundary. */
class SessionPinningSpec extends AnyFunSuite with SparkTestSession {

  private def corpus = {
    import spark.implicits._
    val rows = (0 until 6).flatMap { p =>
      val shared = (0 until 26).map(k => s"s${p}w$k").mkString(" ")
      Seq((2L * p, s"$shared " + (0 until 14).map(k => s"a${p}t$k").mkString(" ")),
        (2L * p + 1, s"$shared " + (0 until 14).map(k => s"b${p}t$k").mkString(" ")))
    } ++ (0 until 8).map(i =>
      (100L + i, (0 until 25).map(k => s"f${i}u$k").mkString(" ")))
    rows.toDF("doc_id", "text")
  }

  test("processState + widenMigrate run green from a session-less thread") {
    val docs = corpus.localCheckpoint(true)
    val statePath = java.nio.file.Files
      .createTempDirectory("session-pin").toString
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val t = new Thread(() => {
      try {
        // simulate a dispatcher-descended thread that never saw the
        // session: without entry-point pinning, any plan forced outside
        // a Spark-guarded action here is built with session == null
        SparkSession.clearActiveSession()
        val inc = new IncrementalNearDup(statePath)
        inc.processState(LlmText.nearDupState(docs).localCheckpoint(true), 0L)
        IncrementalNearDup.widenMigrate(spark, statePath, docs, 8, 4)
        val inc84 = new IncrementalNearDup(statePath, nBands = 8, bandR = 4)
        assert(inc84.pairs(spark).count() >= 0L)
      } catch { case e: Throwable => err.set(e) }
    }, "session-pin-drill")
    t.start()
    t.join(300000)
    assert(!t.isAlive, "session-less drill did not finish in 5 minutes")
    assert(err.get == null, s"session-less drill failed: ${err.get}")
  }

  test("Jobs.awaitAll pins the caller's session on every pool thread") {
    SparkSession.setActiveSession(spark)
    // more thunks than pool threads, so reused threads re-pin too
    val pinned = Jobs.awaitAll("session pin probe")((1 to 16).map(_ =>
      () => SparkSession.getActiveSession.contains(spark)))
    assert(pinned.forall(identity))
  }
}
