package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.queries.LlmText
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bands/ replay guard through the bloom sidecar (the one state
  * read the bucket layout cannot prune): fast path proven on disjoint
  * batches (zero committed-dir IO — pinned via the path counters),
  * exact path proven on replay (no duplicate rows), heal path proven
  * on a lost sidecar, and the crash-ordering window (segment durable,
  * data append not) proven to only route docs to the exact path —
  * never to drop them. */
class BloomGuardSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def stateSlice(lo: Long, hi: Long) =
    LlmText.nearDupState(
      Tables(spark, dir, "documents")
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .select(col("doc_id"), col("text")))
      .localCheckpoint(true)

  private def bandRows(statePath: String) =
    spark.read.parquet(s"$statePath/bands")
      .select("doc_id", "band").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq

  test("disjoint batches take the fast path; a replay takes the exact path and appends nothing") {
    val statePath = java.nio.file.Files
      .createTempDirectory("bloom-guard").toString
    val inc = new IncrementalNearDup(statePath)
    val a = stateSlice(0, 50)
    val b = stateSlice(50, 100)
    inc.processState(a, 0L)
    inc.processState(b, 1L)
    // batch 0 seeds, batch 1 is disjoint: both fast, neither read the
    // committed dir for the guard
    assert(inc.guardFastCount == 2 && inc.guardExactCount == 0,
      s"fast=${inc.guardFastCount} exact=${inc.guardExactCount}")
    val afterTwo = bandRows(statePath)
    assert(afterTwo.nonEmpty && afterTwo.distinct.size == afterTwo.size)

    // full replay of batch 0: every doc might-contained -> exact path,
    // anti-join finds them committed, nothing appended
    inc.processState(a, 0L)
    assert(inc.guardExactCount == 1)
    assert(bandRows(statePath).sorted == afterTwo.sorted,
      "replay changed the committed band rows")
  }

  test("a lost sidecar heals from the committed dir and stays replay-safe") {
    val statePath = java.nio.file.Files
      .createTempDirectory("bloom-heal").toString
    val inc = new IncrementalNearDup(statePath)
    val a = stateSlice(0, 60)
    inc.processState(a, 0L)
    val committed = bandRows(statePath)

    // simulate a crash-deleted (or pre-feature) sidecar
    val sidecar = new java.io.File(
      StateLayout.bloomSidecar(s"$statePath/bands"))
    sidecar.listFiles().foreach(_.delete())
    assert(StateLayout.readBlooms(spark,
      StateLayout.bloomSidecar(s"$statePath/bands")).isEmpty)

    // replay on the healed sidecar: rebuilt from the committed dir, so
    // the replayed docs route to the exact path and append nothing
    inc.processState(a, 0L)
    assert(inc.guardExactCount == 1)
    assert(bandRows(statePath).sorted == committed.sorted)
    assert(StateLayout.readBlooms(spark,
      StateLayout.bloomSidecar(s"$statePath/bands")).nonEmpty,
      "heal did not rebuild the sidecar")
  }

  test("the crash window (segment durable, append lost) routes to the exact path, never drops") {
    val statePath = java.nio.file.Files
      .createTempDirectory("bloom-crash").toString
    val inc = new IncrementalNearDup(statePath)
    inc.processState(stateSlice(0, 40), 0L)
    val before = bandRows(statePath)

    // the crash: batch 1's segment committed BEFORE its data append
    // died — the sidecar now over-approximates the committed doc set
    val c = stateSlice(40, 80)
    StateLayout.appendBloom(spark,
      StateLayout.bloomSidecar(s"$statePath/bands"),
      LlmText.bandKeys(c, 8, 2).select("doc_id"), "doc_id")

    // the replay: batch 1's docs are might-contained (exact path), the
    // anti-join finds nothing committed, and the batch appends in full
    inc.processState(c, 1L)
    assert(inc.guardExactCount == 1)
    val after = bandRows(statePath)
    val newDocs = after.map(_._1).toSet -- before.map(_._1).toSet
    val expect = LlmText.bandKeys(c, 8, 2).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(newDocs == expect,
      s"crash-window replay dropped docs: missing=${(expect -- newDocs).take(5)}")
    assert(after.distinct.size == after.size, "duplicate band rows")
  }
}
