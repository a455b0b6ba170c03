package graft

import org.scalatest.funsuite.AnyFunSuite

/** The multi-shard ingest harness's correctness (its RATE is a bench
  * number, asserted nowhere — this pins the mechanics): four
  * concurrent server+client pairs each drain their whole scripted
  * feed exactly (the harness `require`s per-shard conservation — a
  * dropped or duplicated event fails the run, so the reported
  * aggregate rate can never be computed over a partial drain), and
  * the barrier-coordinated timed window yields a positive finite
  * rate. */
class ShardedIngestSpec extends AnyFunSuite {

  test("4-shard ingest drains every shard exactly and yields a finite rate") {
    val eps = Bench.ingestEventsPerSecSharded(shards = 4, n = 5000, warm = 1000)
    assert(eps > 0 && java.lang.Double.isFinite(eps))
  }

  test("a single-shard run through the same harness is also exact") {
    val eps = Bench.ingestEventsPerSecSharded(shards = 1, n = 5000, warm = 1000)
    assert(eps > 0 && java.lang.Double.isFinite(eps))
  }
}
