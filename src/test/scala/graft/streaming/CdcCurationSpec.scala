package graft.streaming

import graft.SparkTestSession
import graft.queries.{LlmText, Pipeline}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** qc21's failure drills — the CDC-fed materialized CURATION VIEW
  * (one wire feed maintaining the doc replica, the near-dup pair
  * index, and the line-chunk state; q124's four decision layers
  * composed at emission). The oracle hash gate (Verify/check.py) runs
  * the happy path against q124's composed SQL over the survivors;
  * this spec covers what that can't:
  *
  *  1. the wire view equals the BATCH composition computed directly
  *     over the survivor fixture (engine-vs-engine, a third form
  *     independent of both the wire states and the DuckDB CTEs);
  *  2. the delete wave is load-bearing: the insert-only prefix's view
  *     differs, and no deleted doc survives in any of the three
  *     states feeding the emission;
  *  3. kill/resume inside the delete section: all THREE states
  *     (replica, pair index, chunk state) recover from one checkpoint
  *     and the resumed emission equals the one-shot.
  */
class CdcCurationSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def manifestRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("qc21: wire curation view equals the batch composition on survivors, across a restart in the delete section") {
    val events = CdcAnalytics.docRetractWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc21-restart").toString

    def run(evs: Seq[String], opts: Map[String, String] = Map.empty):
        (CdcSnapshotTable, IncrementalNearDup, IncrementalLineDedup) = {
      val replica = new CdcSnapshotTable(s"$tmp/replica", Seq("doc_id"),
        CdcAnalytics.docPayloadSchema)
      val lineInc = new IncrementalLineDedup(s"$tmp/lines",
        autoCompactFiles = CdcAnalytics.DrillCompactFiles)
      val ndInc = CdcAnalytics.runNearDupRetractPipeline(spark, evs,
        s"$tmp/state", s"$tmp/ckpt", evs.size.toLong,
        sourceOptions = Map("maxEventsPerTrigger" -> "64") ++ opts,
        replica = Some(replica), lineInc = Some(lineInc))
      (replica, ndInc, lineInc)
    }
    def emit(st: (CdcSnapshotTable, IncrementalNearDup, IncrementalLineDedup)) =
      manifestRows(CdcAnalytics.curationViewEmission(spark, st._1, st._2, st._3))

    // one-shot wire run on its own paths (fresh tmp per phase set)
    val oneTmp = java.nio.file.Files.createTempDirectory("qc21-oneshot").toString
    val oneReplica = new CdcSnapshotTable(s"$oneTmp/replica", Seq("doc_id"),
      CdcAnalytics.docPayloadSchema)
    val oneLine = new IncrementalLineDedup(s"$oneTmp/lines",
      autoCompactFiles = CdcAnalytics.DrillCompactFiles)
    // snapshot the insert-only view BEFORE deletes arrive: split the
    // feed at the delete boundary and run the prefix first
    val nDel = events.count(_.contains("\"event_type\":\"delete\""))
    val insertsOnly = events.take(events.size - nDel)
    CdcAnalytics.runNearDupRetractPipeline(spark, insertsOnly,
      s"$oneTmp/state", s"$oneTmp/ckpt", insertsOnly.size.toLong,
      sourceOptions = Map("maxEventsPerTrigger" -> "64"),
      replica = Some(oneReplica), lineInc = Some(oneLine))
    val preDelete = manifestRows(CdcAnalytics.curationViewEmission(
      spark, oneReplica, new IncrementalNearDup(s"$oneTmp/state"), oneLine))
    // then the delete tail through the SAME checkpoint — the one-shot
    // final state (binlog order preserved; schema resent at stream head)
    val tail = CdcAnalytics.docDdlJson +: events.drop(insertsOnly.size)
    val oneNd = CdcAnalytics.runNearDupRetractPipeline(spark, tail,
      s"$oneTmp/state", s"$oneTmp/ckpt", tail.size.toLong,
      sourceOptions = Map("maxEventsPerTrigger" -> "64"),
      replica = Some(oneReplica), lineInc = Some(oneLine))
    val oneShot = manifestRows(CdcAnalytics.curationViewEmission(
      spark, oneReplica, oneNd, oneLine))
    assert(oneShot.nonEmpty)

    // (2) the delete wave is load-bearing on the view
    assert(preDelete != oneShot,
      "deleting a seventh of the corpus left the curation manifest unchanged")
    // ...and no deleted doc survives in any state feeding the emission
    val deletedLive = oneReplica.snapshot(spark)
      .where(col("doc_id") % CdcAnalytics.RetractMod === 0).count()
    assert(deletedLive == 0L, s"$deletedLive deleted docs still live in the replica")
    val deletedPairs = oneNd.pairs(spark)
      .where(col("doc_a") % CdcAnalytics.RetractMod === 0 ||
        col("doc_b") % CdcAnalytics.RetractMod === 0).count()
    assert(deletedPairs == 0L, s"$deletedPairs pair edges still touch a deleted doc")
    val deletedChunks = oneLine.chunksLive(spark)
      .where(col("doc_id") % CdcAnalytics.RetractMod === 0).count()
    assert(deletedChunks == 0L, s"$deletedChunks chunks still owned by a deleted doc")

    // (1) equals the batch composition computed directly over the
    // survivor fixture — no wire, no incremental state, no DuckDB
    val docsSurv = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .where(col("doc_id") % CdcAnalytics.RetractMod =!= 0)
    val st = LlmText.nearDupState(docsSurv)
    val pairs = LlmText.verifyPairs(LlmText.bandedCandidates(st, 8, 2),
      st.select(col("doc_id"), col("hs"), col("nbg")))
    val comps = graft.operators.DedupGroups.components(pairs)
    val batch = manifestRows(
      Pipeline.curationManifestFrom(docsSurv, comps, LlmText.lineChunks))
    assert(oneShot == batch, "wire curation view diverges from the batch composition")

    // (3) kill/resume inside the delete section on fresh shared paths:
    // some tombstones land before the outage, some after; all three
    // states resume from the one checkpoint
    val cut = events.size - nDel / 2
    val phaseA = events.take(cut)
    val phaseB = CdcAnalytics.docDdlJson +: events.drop(cut)
    run(phaseA)
    val resumed = run(phaseB.toVector)
    assert(emit(resumed) == oneShot,
      "resumed curation view diverges from the one-shot run")
  }
}
