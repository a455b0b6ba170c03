package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The qc1 composition's failure drills — the properties the oracle
  * hash can't exercise because Verify only ever runs the happy path:
  *
  *  1. mid-workload restart: stop the stream partway through the
  *     binlog (inside an update_before/update_after pair, so binlog
  *     ordering spans the outage), restart against a NEW connection
  *     serving the remainder (schema re-sent at stream head, offsets
  *     resumed from the checkpoint), and require the final snapshot to
  *     equal the one-shot run row-for-row;
  *  2. forced micro-batch fragmentation: maxEventsPerTrigger=37 chops
  *     the same workload into many batches with update pairs split
  *     across batch boundaries — batch-boundary placement must not be
  *     observable in the result;
  *  3. batch replay: re-applying a committed batchId (what a
  *     foreachBatch retry after a crash does) must be bit-for-bit
  *     idempotent on the snapshot.
  */
class CdcAnalyticsSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def rows(snap: CdcSnapshotTable): Seq[(Long, Int, Long)] =
    snap.snapshot(spark).orderBy("custkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("mid-workload kill/restart resumes from the checkpoint to the one-shot result") {
    val events = CdcAnalytics.workloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("cdc-restart").toString

    val oneShot = CdcAnalytics.runPipeline(spark, events,
      s"$tmp/ref_snap", s"$tmp/ref_ckpt", events.size.toLong)
    val expected = rows(oneShot)
    assert(expected.nonEmpty)

    // cut INSIDE the update section at an odd offset: the last phase-A
    // event is an update_before whose matching update_after only
    // arrives after the restart — resume must preserve binlog order
    // across the outage
    val cut = 1 + 150 + 37
    assert(events(cut - 1).contains("update_before") &&
      events(cut).contains("update_after"),
      "fixture drift: the cut no longer splits an update pair")
    val phaseA = events.take(cut)
    // a reconnect's stream is self-describing: schema first, then data
    val phaseB = CdcAnalytics.ddlJson +: events.drop(cut)

    CdcAnalytics.runPipeline(spark, phaseA,
      s"$tmp/snap", s"$tmp/ckpt", phaseA.size.toLong)
    val resumed = CdcAnalytics.runPipeline(spark, phaseB,
      s"$tmp/snap", s"$tmp/ckpt", phaseB.size.toLong)

    assert(rows(resumed) == expected)
  }

  test("micro-batch boundaries are not observable: fragmented run equals one-shot") {
    val events = CdcAnalytics.workloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("cdc-frag").toString
    val ref = CdcAnalytics.runPipeline(spark, events,
      s"$tmp/ref_snap", s"$tmp/ref_ckpt", events.size.toLong)
    val frag = CdcAnalytics.runPipeline(spark, events,
      s"$tmp/frag_snap", s"$tmp/frag_ckpt", events.size.toLong,
      sourceOptions = Map("maxEventsPerTrigger" -> "37"))
    assert(frag.snapshotIds(spark).size > 1, "fragmentation did not happen")
    assert(rows(frag) == rows(ref))
  }

  test("qc2: CDC-fed line-dedup state equals batch q119, across a mid-workload restart") {
    // the qc2 composition's drill: kill the stream partway through the
    // md5-shuffled insert binlog, resume against a NEW connection
    // (schema re-sent at stream head), and require the emitted dedup
    // stats to equal BOTH the one-shot wire run and the pure batch
    // q119 over the same fixture — the wire path and the dedup state
    // must each be outage- and arrival-order-invariant
    val events = CdcAnalytics.docWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc2-restart").toString

    def lines(inc: IncrementalLineDedup): Seq[(Long, Long, Long, String)] =
      inc.lines(spark).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

    val oneShot = CdcAnalytics.runDocPipeline(spark, events,
      s"$tmp/ref_state", s"$tmp/ref_ckpt", events.size.toLong)
    val expected = lines(oneShot)
    assert(expected.nonEmpty)

    val batch = graft.SparkEntry.queries("q119_line_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(expected == batch, "wire run diverges from batch q119")

    val cut = events.size / 2
    val phaseA = events.take(cut)
    val phaseB = CdcAnalytics.docDdlJson +: events.drop(cut)
    CdcAnalytics.runDocPipeline(spark, phaseA,
      s"$tmp/state", s"$tmp/ckpt", phaseA.size.toLong)
    val resumed = CdcAnalytics.runDocPipeline(spark, phaseB,
      s"$tmp/state", s"$tmp/ckpt", phaseB.size.toLong)
    assert(lines(resumed) == expected)
  }

  test("qc3: CDC-fed incremental IVF equals batch q88, across a mid-workload restart") {
    // the qc3 drill (the qc2 pattern on the ANN layer): kill the
    // arrival stream partway through the md5-shuffled insert binlog,
    // resume against a NEW connection, and require the composed-index
    // summary to equal BOTH the one-shot wire run and pure batch q88 —
    // the wire path and the map-only assignment state must each be
    // outage- and arrival-order-invariant
    import graft.operators.KMeansLloyd
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), KMeansLloyd.quantize(col("embedding")).as("xi"))
    val (baseAssigned, servingCents, _) = KMeansLloyd.runTracked(
      vecs.where(col("vec_id") % 5 =!= 4), "vec_id", k = 4, iters = 2)
    val events = CdcAnalytics.vecWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc3-restart").toString

    def summary(inc: IncrementalIvf): Seq[(Long, Long, Long, Long)] =
      graft.queries.Vectors.ivfCompositionSummary(baseAssigned, inc.members(spark))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    val oneShot = CdcAnalytics.runVecPipeline(spark, events,
      s"$tmp/ref_state", s"$tmp/ref_ckpt", events.size.toLong, servingCents)
    val expected = summary(oneShot)
    assert(expected.nonEmpty)

    val batch = graft.SparkEntry.queries("q88_incremental_ivf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(expected == batch, "wire run diverges from batch q88")

    val cut = events.size / 2
    val phaseA = events.take(cut)
    val phaseB = CdcAnalytics.vecDdlJson +: events.drop(cut)
    CdcAnalytics.runVecPipeline(spark, phaseA,
      s"$tmp/state", s"$tmp/ckpt", phaseA.size.toLong, servingCents)
    val resumed = CdcAnalytics.runVecPipeline(spark, phaseB,
      s"$tmp/state", s"$tmp/ckpt", phaseB.size.toLong, servingCents)
    assert(summary(resumed) == expected)
  }

  test("qc4: CDC-fed drift monitor equals batch q107, across a mid-workload restart") {
    // the qc4 drill: kill the event stream partway through the
    // md5-shuffled insert binlog, resume against a NEW connection, and
    // require the PSI table to equal BOTH the one-shot wire run and
    // pure batch q107 — doubles and µs timestamps must round-trip the
    // wire exactly, and the feed state must be arrival-order- and
    // outage-invariant
    import org.apache.spark.sql.functions.{col, expr}
    val events = CdcAnalytics.eventWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc4-restart").toString

    def psiOf(feedDir: String): Seq[(String, Long)] =
      graft.queries.Behavioral.psiFromBinned(graft.queries.Behavioral.binnedDrift(
          spark.read.parquet(feedDir)
            .select(col("etype").as("event_type"), col("value"),
              expr("timestamp_micros(ts_us)").as("ts"))))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    val refDir = CdcAnalytics.runEventPipeline(spark, events,
      s"$tmp/ref_state", s"$tmp/ref_ckpt", events.size.toLong)
    val expected = psiOf(refDir)
    assert(expected.nonEmpty)

    val batch = graft.SparkEntry.queries("q107_distribution_drift")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(expected == batch, "wire run diverges from batch q107")

    val cut = events.size / 2
    val phaseA = events.take(cut)
    val phaseB = CdcAnalytics.eventDdlJson +: events.drop(cut)
    CdcAnalytics.runEventPipeline(spark, phaseA,
      s"$tmp/state", s"$tmp/ckpt", phaseA.size.toLong)
    val resumedDir = CdcAnalytics.runEventPipeline(spark, phaseB,
      s"$tmp/state", s"$tmp/ckpt", phaseB.size.toLong)
    assert(psiOf(resumedDir) == expected)
  }

  test("qc5: CDC-fed report card equals batch q133, across a mid-workload restart") {
    // the qc5 drill: kill the corpus stream partway through the
    // md5-shuffled insert binlog, resume on a NEW connection, and
    // require the crosstab to equal BOTH the one-shot wire run and
    // pure batch q133 — including the retroactive dup flags whose
    // duplicate partner may arrive in the other phase
    val events = CdcAnalytics.corpusWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc5-restart").toString

    def card(inc: IncrementalReportCard): Seq[(String, String, Long, Long, Double, Long)] =
      inc.reportCard(spark).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getLong(5))).toSeq

    val oneShot = CdcAnalytics.runCorpusPipeline(spark, events,
      s"$tmp/ref_state", s"$tmp/ref_ckpt", events.size.toLong)
    val expected = card(oneShot)
    assert(expected.nonEmpty)

    val batch = graft.SparkEntry.queries("q133_corpus_report_card")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5))).toSeq
    assert(expected == batch, "wire run diverges from batch q133")

    val cut = events.size / 2
    val phaseA = events.take(cut)
    val phaseB = CdcAnalytics.corpusDdlJson +: events.drop(cut)
    CdcAnalytics.runCorpusPipeline(spark, phaseA,
      s"$tmp/state", s"$tmp/ckpt", phaseA.size.toLong)
    val resumed = CdcAnalytics.runCorpusPipeline(spark, phaseB,
      s"$tmp/state", s"$tmp/ckpt", phaseB.size.toLong)
    assert(card(resumed) == expected)
  }

  test("qc6: CDC delete retraction equals batch q119 on survivors, across a restart in the delete section") {
    // the qc6 drill: the insert+delete binlog, killed INSIDE the
    // delete section (some tombstones land before the outage, some
    // after), resumed on a NEW connection — the emitted dedup stats
    // must equal BOTH the one-shot wire run and a pure batch q119 over
    // the SURVIVING docs. Also pins that retraction is load-bearing:
    // the survivors' result differs from naively filtering the
    // full-corpus q119 output to surviving ids (a deleted owner's line
    // must be RE-OWNED, not orphaned).
    import org.apache.spark.sql.functions.col
    val events = CdcAnalytics.docRetractWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc6-restart").toString

    def lines(inc: IncrementalLineDedup): Seq[(Long, Long, Long, String)] =
      inc.lines(spark).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

    // maxEventsPerTrigger forces a LONG drill (many micro-batches) so
    // state files accumulate across batches — without it the sf0.001
    // workload drains in ONE batch (16 files) and the compaction policy
    // has nothing to do; batching must be unobservable in the result
    // (pinned by the fragmented-run spec above), so this only exercises
    // more machinery under the same oracle
    val oneShot = CdcAnalytics.runDocRetractPipeline(spark, events,
      s"$tmp/ref_state", s"$tmp/ref_ckpt", events.size.toLong,
      sourceOptions = Map("maxEventsPerTrigger" -> "64"))
    val expected = lines(oneShot)
    assert(expected.nonEmpty)
    assert(expected.forall(_._1 % CdcAnalytics.RetractMod != 0),
      "a deleted doc leaked into the emitted relation")
    // VERDICT r10 item 5's bar: the automatic compaction policy fires
    // INSIDE the wire drill (DrillCompactFiles keeps the threshold
    // within this bounded workload) — with the content identity below
    // it proves firing mid-stream is hash-neutral
    assert(oneShot.compactionCount > 0,
      "auto-compaction never fired in the qc6 wire drill")

    // independent batch twin: q119's stages straight over the
    // surviving fixture docs, no CDC anywhere
    import graft.queries.LlmText
    val survivors = graft.Tables(spark, dir, "documents")
      .where(col("doc_id") % CdcAnalytics.RetractMod =!= 0)
      .select(col("doc_id"), col("text"))
    val batch = LlmText.lineDedupStats(LlmText.lineChunks(survivors))
      .select(col("doc_id"), col("orig_chunks"), col("kept_chunks"), col("new_text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(expected == batch, "wire run diverges from batch q119-on-survivors")

    // retraction is load-bearing on this fixture: naively filtering
    // the FULL-corpus q119 output to surviving ids is NOT the same
    // relation (some line's deleted owner must be re-owned)
    val naive = graft.SparkEntry.queries("q119_line_dedup")(spark, dir)
      .where(col("doc_id") % CdcAnalytics.RetractMod =!= 0)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(naive != expected,
      "fixture drift: no deleted doc owned a shared line — retraction untested")

    // kill/resume: cut INSIDE the delete section
    val nDel = events.count(_.contains("\"event_type\":\"delete\""))
    assert(nDel > 2, s"fixture drift: only $nDel deletes")
    val cut = events.size - nDel / 2
    assert(events(cut - 1).contains("\"event_type\":\"delete\"") &&
      events(cut).contains("\"event_type\":\"delete\""),
      "the cut no longer lands inside the delete section")
    val phaseA = events.take(cut)
    val phaseB = CdcAnalytics.docDdlJson +: events.drop(cut)
    CdcAnalytics.runDocRetractPipeline(spark, phaseA,
      s"$tmp/state", s"$tmp/ckpt", phaseA.size.toLong)
    val resumed = CdcAnalytics.runDocRetractPipeline(spark, phaseB,
      s"$tmp/state", s"$tmp/ckpt", phaseB.size.toLong)
    assert(lines(resumed) == expected)
  }

  test("qc7: CDC near-dup retraction equals batch q66b, across a restart in the delete section") {
    // qc6's drill on the near-dup layer: kill inside the delete
    // section (some tombstones land before the outage, some after),
    // resume on a NEW connection, and require the dedup groups to
    // equal BOTH the one-shot wire run and the batch q66b entry (which
    // is itself oracle-held to the survivors-only recursive CTE).
    val events = CdcAnalytics.docRetractWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc7-restart").toString

    def groups(inc: IncrementalNearDup): Seq[(Long, Long)] =
      inc.groups(spark)
        .groupBy(org.apache.spark.sql.functions.col("rep"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .orderBy("rep").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq

    // long drill via small triggers — see qc6's note; the near-dup
    // state then pays per-batch banded work across ~8 batches, which is
    // exactly the accumulation profile the compaction policy targets
    val oneShot = CdcAnalytics.runNearDupRetractPipeline(spark, events,
      s"$tmp/ref_state", s"$tmp/ref_ckpt", events.size.toLong,
      sourceOptions = Map("maxEventsPerTrigger" -> "64"))
    val expected = groups(oneShot)
    assert(expected.nonEmpty)
    assert(expected.forall(_._1 % CdcAnalytics.RetractMod != 0),
      "a deleted doc survived as a group representative")
    // item-5 bar, near-dup side: the policy fires inside the drill
    assert(oneShot.compactionCount > 0,
      "auto-compaction never fired in the qc7 wire drill")

    val batch = graft.SparkEntry.queries("q66b_incremental_dedup_retract")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(expected == batch, "wire run diverges from batch q66b")

    val nDel = events.count(_.contains("\"event_type\":\"delete\""))
    val cut = events.size - nDel / 2
    val phaseA = events.take(cut)
    val phaseB = CdcAnalytics.docDdlJson +: events.drop(cut)
    CdcAnalytics.runNearDupRetractPipeline(spark, phaseA,
      s"$tmp/state", s"$tmp/ckpt", phaseA.size.toLong)
    val resumed = CdcAnalytics.runNearDupRetractPipeline(spark, phaseB,
      s"$tmp/state", s"$tmp/ckpt", phaseB.size.toLong)
    assert(groups(resumed) == expected)
  }

  test("qc8: continuous state-store near-dup equals batch q57, across a mid-workload restart") {
    // the one-continuous-plan composition's drill: kill the stream
    // partway through the insert binlog, resume on a NEW connection
    // with the SAME checkpoint — source offsets, the RocksDB bucket
    // state AND the file sink's commit log must all recover together —
    // and require the final dedup groups to equal both the one-shot
    // wire run and the pure batch q57 entry.
    val events = CdcAnalytics.docWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc8-restart").toString

    def groupsOf(evDir: String): Seq[(Long, Long)] = {
      import graft.queries.LlmText
      val cands = spark.read.schema(CdcAnalytics.CandEventSchema)
        .parquet(evDir).select("doc_a", "doc_b").distinct()
      val st = LlmText.bigramStateCached(spark, dir)
      graft.operators.DedupGroups.components(
          LlmText.verifyPairs(cands, st.select("doc_id", "hs", "nbg")))
        .groupBy(org.apache.spark.sql.functions.col("rep"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .orderBy("rep").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }

    CdcAnalytics.runStateStoreNearDupPipeline(spark, events,
      s"$tmp/ref_events", s"$tmp/ref_ckpt", events.size.toLong,
      sourceOptions = Map("maxEventsPerTrigger" -> "64"))
    val expected = groupsOf(s"$tmp/ref_events")
    assert(expected.nonEmpty)

    val batch = graft.SparkEntry.queries("q57_dedup_groups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(expected == batch, "wire run diverges from batch q57")

    val cut = events.size / 2
    val phaseA = events.take(cut)
    val phaseB = CdcAnalytics.docDdlJson +: events.drop(cut)
    CdcAnalytics.runStateStoreNearDupPipeline(spark, phaseA,
      s"$tmp/events", s"$tmp/ckpt", phaseA.size.toLong)
    CdcAnalytics.runStateStoreNearDupPipeline(spark, phaseB,
      s"$tmp/events", s"$tmp/ckpt", phaseB.size.toLong)
    assert(groupsOf(s"$tmp/events") == expected)
  }

  test("qc10: continuous-plan retraction equals batch q66b, across a restart in the delete section") {
    // the qc7 drill through the CONTINUOUS plan: DELETEs flow through
    // the same one-shuffle streaming plan as inserts (no foreachBatch
    // routing split), the kill lands inside the delete section (some
    // tombstone events durable before the outage, some after), and the
    // resumed run must recover source offsets, the RocksDB claimant
    // state AND the sink's commit log together.
    val events = CdcAnalytics.docRetractWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc10-restart").toString

    def groupsOf(evDir: String): Seq[(Long, Long)] = {
      import graft.queries.LlmText
      val ev = spark.read.schema(CdcAnalytics.OpEventSchema).parquet(evDir)
      val st = LlmText.bigramStateCached(spark, dir)
      val verified = LlmText.verifyPairs(StateStoreNearDup.foldOpEvents(ev),
        st.where(org.apache.spark.sql.functions.col("doc_id") %
          CdcAnalytics.RetractMod =!= 0).select("doc_id", "hs", "nbg"))
      graft.operators.DedupGroups.components(verified)
        .groupBy(org.apache.spark.sql.functions.col("rep"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .orderBy("rep").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }

    CdcAnalytics.runStateStoreNearDupRetractPipeline(spark, events,
      s"$tmp/ref_events", s"$tmp/ref_ckpt", events.size.toLong,
      sourceOptions = Map("maxEventsPerTrigger" -> "64"))
    val expected = groupsOf(s"$tmp/ref_events")
    assert(expected.nonEmpty)
    assert(expected.forall(_._1 % CdcAnalytics.RetractMod != 0),
      "a deleted doc survived as a group representative")

    val batch = graft.SparkEntry.queries("q66b_incremental_dedup_retract")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(expected == batch, "wire run diverges from batch q66b")

    val nDel = events.count(_.contains("\"event_type\":\"delete\""))
    val cut = events.size - nDel / 2
    CdcAnalytics.runStateStoreNearDupRetractPipeline(spark, events.take(cut),
      s"$tmp/events", s"$tmp/ckpt", cut.toLong)
    CdcAnalytics.runStateStoreNearDupRetractPipeline(spark,
      CdcAnalytics.docDdlJson +: events.drop(cut),
      s"$tmp/events", s"$tmp/ckpt", (events.size - cut + 1).toLong)
    assert(groupsOf(s"$tmp/events") == expected)
  }

  test("qc9: continuous state-store line dedup equals batch q119, across a mid-workload restart") {
    // qc8's drill on the line-owner state: kill mid-insert, resume on
    // the same checkpoint, require the emitted dedup stats to equal
    // both the one-shot run and batch q119.
    val events = CdcAnalytics.docWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc9-restart").toString

    def statsOf(evDir: String): Seq[(Long, Long, Long, String)] = {
      import graft.queries.LlmText
      val owners = spark.read.schema(CdcAnalytics.OwnerEventSchema)
        .parquet(evDir)
        .groupBy(org.apache.spark.sql.functions.col("chunk"))
        .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.struct(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("ck"))).as("owner"))
        .select(org.apache.spark.sql.functions.col("chunk"),
          org.apache.spark.sql.functions.col("owner.doc_id").as("o_doc"),
          org.apache.spark.sql.functions.col("owner.ck").as("o_ck"))
      val docs = graft.Tables(spark, dir, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      StateStoreLineDedup.lineDedupViaOwners(LlmText.lineChunks(docs), owners)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    }

    CdcAnalytics.runStateStoreLineDedupPipeline(spark, events,
      s"$tmp/ref_events", s"$tmp/ref_ckpt", events.size.toLong)
    val expected = statsOf(s"$tmp/ref_events")
    assert(expected.nonEmpty)

    val batch = graft.SparkEntry.queries("q119_line_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(expected == batch, "wire run diverges from batch q119")

    val cut = events.size / 2
    CdcAnalytics.runStateStoreLineDedupPipeline(spark, events.take(cut),
      s"$tmp/events", s"$tmp/ckpt", cut.toLong)
    CdcAnalytics.runStateStoreLineDedupPipeline(spark,
      CdcAnalytics.docDdlJson +: events.drop(cut),
      s"$tmp/events", s"$tmp/ckpt", (events.size - cut + 1).toLong)
    assert(statsOf(s"$tmp/events") == expected)
  }

  test("qc11: bootstrap + GTID handoff equals batch q57; the wire never carries the historical half") {
    // the handoff seam's drills, beyond the oracle's happy path:
    //  1. the SKIP is real — the GTID-honoring server streams exactly
    //     DDL + the live half (eventsSent), so the bootstrap didn't
    //     just win a replay-guard race against a full resend;
    //  2. the result equals the oracle-held batch q57 entry;
    //  3. kill/resume mid-live-half: the restarted source re-subscribes
    //     with the CHECKPOINT-adopted GTID (not the configured
    //     frontier), so the second connection skips the committed
    //     prefix too — true GTID resume, where the qc2/qc7 drills rely
    //     on replay guards to absorb full resends.
    val events = CdcAnalytics.docWorkloadEvents(spark, dir)
    val nDocs = events.size - 1
    val k = CdcAnalytics.bootstrapSplit(nDocs)
    val fKey = CdcAnalytics.frontierShuffleKey(events, k)
    val tmp = java.nio.file.Files.createTempDirectory("qc11-drill").toString

    def groups(inc: IncrementalNearDup): Seq[(Long, Long)] =
      inc.groups(spark)
        .groupBy(org.apache.spark.sql.functions.col("rep"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .orderBy("rep").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq

    // one-shot: small triggers force multiple batches (and commits)
    val (oneShot, server) = CdcAnalytics.runBootstrapHandoffPipeline(
      spark, dir, events, s"$tmp/ref_state", s"$tmp/ref_ckpt",
      expectRows = 1L + (nDocs - k),
      frontierGtid = s"0-1-$k", frontierKey = fKey, bootstrap = true,
      sourceOptions = Map("maxEventsPerTrigger" -> "64"))
    val expected = groups(oneShot)
    assert(expected.nonEmpty)
    assert(server.eventsSent == 1 + (nDocs - k),
      s"server streamed ${server.eventsSent} events, expected DDL + live half ${1 + (nDocs - k)}")
    assert(server.requestDataReceived.trim.endsWith(s"0-1-$k"),
      s"REQUEST-DATA did not carry the frontier GTID: ${server.requestDataReceived}")

    val batch = graft.SparkEntry.queries("q57_dedup_groups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(expected == batch, "handoff run diverges from batch q57")

    // kill mid-live-half (events.take(cut) ends the feed early), then
    // resume against a server holding the FULL binlog: the adopted
    // checkpoint GTID must keep the committed prefix off the wire
    val cut = 1 + k + (nDocs - k) / 2 // event index; live DMLs are k+1..nDocs
    val (_, _) = CdcAnalytics.runBootstrapHandoffPipeline(
      spark, dir, events.take(cut), s"$tmp/state", s"$tmp/ckpt",
      expectRows = 1L + (cut - 1 - k),
      frontierGtid = s"0-1-$k", frontierKey = fKey, bootstrap = true,
      sourceOptions = Map("maxEventsPerTrigger" -> "64"))
    val (resumed, server2) = CdcAnalytics.runBootstrapHandoffPipeline(
      spark, dir, events, s"$tmp/state", s"$tmp/ckpt",
      expectRows = 1L + (nDocs - (cut - 1)), // lower bound: full redelivery of the uncommitted tail only
      frontierGtid = s"0-1-$k", frontierKey = fKey, bootstrap = false,
      exactDrain = false,
      sourceOptions = Map("maxEventsPerTrigger" -> "64"))
    assert(groups(resumed) == expected)
    // the committed prefix stayed off the wire: strictly fewer events
    // than the full live half (phase A committed at least one batch)
    assert(server2.eventsSent < 1 + (nDocs - k),
      s"GTID resume re-streamed the whole live half (${server2.eventsSent} events)")
  }

  test("replaying a committed batchId is bit-for-bit idempotent") {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("cdc-replay").toString
    val snap = new CdcSnapshotTable(tmp, Seq("custkey"), CdcAnalytics.payloadSchema)
    val cdcSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType) +:
      org.apache.spark.sql.types.StructField("sequence", org.apache.spark.sql.types.LongType) +:
      org.apache.spark.sql.types.StructField("event_number", org.apache.spark.sql.types.LongType) +:
      CdcAnalytics.payloadSchema.fields.toSeq)
    def batch(rws: Seq[Row]) = spark.createDataFrame(rws.asJava, cdcSchema)

    snap.applyBatch(batch(Seq(
      Row("insert", 1L, 1L, 1L, 10, 100L),
      Row("insert", 2L, 1L, 2L, 11, 200L))), 0L)
    val b1 = batch(Seq(
      Row("update_before", 3L, 1L, 1L, 10, 100L),
      Row("update_after", 3L, 2L, 1L, 10, 150L),
      Row("delete", 4L, 1L, 2L, 11, 200L)))
    snap.applyBatch(b1, 1L)
    val before = rows(snap)
    assert(before == Seq((1L, 10, 150L)))

    snap.applyBatch(b1, 1L) // foreachBatch retry / restart replay
    assert(rows(snap) == before)
    assert(snap.snapshotIds(spark) == Seq(0L, 1L))
  }

  test("qc12: re-band maintenance window equals batch (4,4) over survivors; wave-2 re-delivery is a no-op") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val (w1, w2) = CdcAnalytics.docMigrationWorkloadEvents(spark, dir)
    assert(w2.exists(_.contains("\"event_type\":\"delete\"")))
    val tmp = java.nio.file.Files.createTempDirectory("qc12-drill").toString

    def groups(inc: IncrementalNearDup): Seq[(Long, Long)] =
      inc.groups(spark).groupBy(col("rep"))
        .agg(count(lit(1)).as("n")).orderBy("rep").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq

    CdcAnalytics.runNearDupRetractPipeline(spark, w1, s"$tmp/state",
      s"$tmp/ckpt1", w1.size.toLong, nBands = 8, bandR = 2)
    IncrementalNearDup.rebandMigrate(spark, s"$tmp/state", 4, 4)
    val inc = CdcAnalytics.runNearDupRetractPipeline(spark, w2, s"$tmp/state",
      s"$tmp/ckpt2", w2.size.toLong, nBands = 4, bandR = 4)
    val got = groups(inc)
    assert(got.nonEmpty)
    assert(got.forall(_._1 % CdcAnalytics.RetractMod != 0),
      "a deleted doc survived as a group representative")

    // the reference: a fresh batch run AT the target design over the
    // survivors — no wire, no migration, no retraction machinery
    val survivors = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .where(col("doc_id") % CdcAnalytics.RetractMod =!= 0)
    val st = graft.queries.LlmText.nearDupState(survivors).localCheckpoint(true)
    val batch = graft.operators.DedupGroups.components(
        graft.queries.LlmText.verifyPairs(
          graft.queries.LlmText.bandedCandidates(st, 4, 4), st))
      .groupBy(col("rep")).agg(count(lit(1)).as("n")).orderBy("rep")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == batch,
      "migrate-then-continue over the wire diverges from the fresh (4,4) survivors run")

    // full wave-2 re-delivery on the migrated state (a resumed
    // connection replaying the whole post-window binlog): replay
    // guards absorb the inserts, tombstones win on the deletes
    val inc2 = CdcAnalytics.runNearDupRetractPipeline(spark, w2, s"$tmp/state",
      s"$tmp/ckpt3", w2.size.toLong, nBands = 4, bandR = 4)
    assert(groups(inc2) == got, "wave-2 re-delivery changed the state")
  }

  test("qc13: widening window reads ONLY the wire-built replica; equals batch (8,4) over survivors") {
    import org.apache.spark.sql.functions.{col, count, lit, size => asize}
    val (w1, w2) = CdcAnalytics.docMigrationWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc13-drill").toString
    val replica = new CdcSnapshotTable(s"$tmp/replica", Seq("doc_id"),
      CdcAnalytics.docPayloadSchema)

    CdcAnalytics.runNearDupRetractPipeline(spark, w1, s"$tmp/state",
      s"$tmp/ckpt1", w1.size.toLong, nBands = 8, bandR = 2,
      replica = Some(replica))

    // replica fidelity at the window is load-bearing: the migration
    // join drops any committed doc the replica missed — pin that the
    // snapshot holds EXACTLY the wave-1 (even) half before migrating
    val evens = graft.Tables(spark, dir, "documents")
      .where(col("doc_id") % 2 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val snapped = replica.snapshot(spark)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(snapped == evens, "replica snapshot diverges from the streamed half")

    IncrementalNearDup.widenMigrate(spark, s"$tmp/state",
      replica.snapshot(spark).select(col("doc_id"), col("text")), 8, 4)
    // every committed signature is 32-wide after the window
    val widths = spark.read.parquet(s"$tmp/state/sets")
      .select(asize(col("sig"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(widths == Seq(32), s"post-widen signature widths: $widths")

    val inc = CdcAnalytics.runNearDupRetractPipeline(spark, w2, s"$tmp/state",
      s"$tmp/ckpt2", w2.size.toLong, nBands = 8, bandR = 4)
    val got = inc.groups(spark).groupBy(col("rep"))
      .agg(count(lit(1)).as("n")).orderBy("rep").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty)
    assert(got.forall(_._1 % CdcAnalytics.RetractMod != 0),
      "a cross-window-deleted doc survived as a group representative")

    // the reference: a fresh batch run at (8,4) over 32 components on
    // the survivors — no wire, no replica, no migration machinery
    val survivors = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .where(col("doc_id") % CdcAnalytics.RetractMod =!= 0)
    val st = graft.queries.LlmText.nearDupState(survivors, nHashes = 32)
      .localCheckpoint(true)
    val batch = graft.operators.DedupGroups.components(
        graft.queries.LlmText.verifyPairs(
          graft.queries.LlmText.bandedCandidates(st, 8, 4),
          st.select(col("doc_id"), col("hs"), col("nbg"))))
      .groupBy(col("rep")).agg(count(lit(1)).as("n")).orderBy("rep")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == batch,
      "widen-then-continue over the wire diverges from the fresh (8,4) survivors run")
  }

  test("qc14: store rebuild from the replica — kill/resume run equals the single-query run") {
    import org.apache.spark.sql.functions.col
    // the entry itself runs the kill/resume drill (restart after the
    // rebuild wave); pin it two-sided against a single-query run of
    // the same composition — a lost RocksDB snapshot would re-emit
    // rebuild pairs or miss cross-restart pairs and diverge
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val restarted = rows(CdcAnalytics.stateStoreRebuildOverCdc(spark, dir))
    val single = rows(CdcAnalytics.stateStoreRebuildOverCdc(spark, dir,
      restart = None))
    assert(restarted.nonEmpty && restarted == single,
      "restarted rebuild diverges from the single-query run")
    assert(restarted.forall(_._1 % CdcAnalytics.RetractMod != 0),
      "a cross-window-deleted doc survived as a group representative")
  }

  test("qc15: micro-batches split at each table's DDL and versions transition cleanly") {
    // observe (batchId, table, distinct DML versions) across the live
    // run: per table the sequence of non-empty version sets must be a
    // clean [1],[1],...,[2],[2],... — both versions present, never
    // mixed in one batch (the require() inside the pipeline enforces
    // purity; this asserts the TRANSITION actually happened in-stream
    // rather than v2 arriving in a fresh query)
    val balEvents = CdcAnalytics.balWorkloadEvents(spark, dir)
    val ordEvents = CdcAnalytics.ordWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc15-split").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Seq[Int])]
    CdcAnalytics.runMultiTableDdlPipeline(spark, balEvents, ordEvents,
      s"$tmp/snap", s"$tmp/ckpt", (balEvents.size + ordEvents.size).toLong,
      onBatch = (bid, tbl, vers) => { seen.add((bid, tbl, vers)); () })
    val byTable = seen.toArray(Array.empty[(Long, String, Seq[Int])])
      .toSeq.groupBy(_._2)
    Seq(CdcAnalytics.BalTableName, CdcAnalytics.OrdTableName).foreach { t =>
      val versSeq = byTable(t).sortBy(_._1).map(_._3).filter(_.nonEmpty)
      assert(versSeq.forall(_.size == 1), s"$t: mixed-version batch in $versSeq")
      val flat = versSeq.map(_.head)
      assert(flat.contains(1) && flat.contains(2),
        s"$t: both schema versions must appear in-stream, saw $flat")
      assert(flat == flat.sorted, s"$t: version order regressed: $flat")
    }
  }

  test("qc15: kill/resume mid-v1 (balances) and mid-v2 (orders) equals the one-shot run") {
    // A4's per-version resume composed with the evolution drill: the
    // two tables are killed in DIFFERENT schema versions, so the two
    // resumed connections re-announce DIFFERENT current schemas at
    // stream head (the version-qualified REQUEST-DATA contract)
    val balEvents = CdcAnalytics.balWorkloadEvents(spark, dir)
    val ordEvents = CdcAnalytics.ordWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc15-resume").toString
    def emit(snaps: (CdcSnapshotTable, CdcSnapshotTable)): Seq[Seq[Any]] = {
      val (a, b) = snaps
      (a.snapshot(spark).orderBy("custkey").collect() ++
        b.snapshot(spark).orderBy("okey").collect()).map(_.toSeq).toSeq
    }
    val oneShot = emit(CdcAnalytics.runMultiTableDdlPipeline(spark,
      balEvents, ordEvents, s"$tmp/ref_snap", s"$tmp/ref_ckpt",
      (balEvents.size + ordEvents.size).toLong))

    // balances cut INSIDE the v1 insert wave; orders INSIDE v2's
    val balDdl2 = balEvents.indexWhere(e => e.contains("\"version\":2"))
    val ordDdl2 = ordEvents.indexWhere(e => e.contains("\"version\":2"))
    assert(balDdl2 > 1 && ordDdl2 > 1)
    val cutA = 1 + (balDdl2 - 1) / 2             // mid-v1
    val cutB = ordDdl2 + 1 +
      (ordEvents.size - ordDdl2 - 1) / 2         // mid-v2
    val phaseA_bal = balEvents.take(cutA)
    val phaseA_ord = ordEvents.take(cutB)
    // a reconnect's stream is self-describing: the CURRENT version's
    // schema first, then the remaining binlog
    val phaseB_bal = balEvents.head +: balEvents.drop(cutA)           // ddl v1
    val phaseB_ord = ordEvents(ordDdl2) +: ordEvents.drop(cutB)       // ddl v2
    CdcAnalytics.runMultiTableDdlPipeline(spark, phaseA_bal, phaseA_ord,
      s"$tmp/snap", s"$tmp/ckpt", (phaseA_bal.size + phaseA_ord.size).toLong)
    val resumed = emit(CdcAnalytics.runMultiTableDdlPipeline(spark,
      phaseB_bal, phaseB_ord, s"$tmp/snap", s"$tmp/ckpt",
      (phaseB_bal.size + phaseB_ord.size).toLong))
    assert(resumed.nonEmpty && resumed == oneShot,
      "resumed two-table evolution diverges from the one-shot run")
  }

  test("qc16: an outage spanning the rename DDL resumes to the one-shot dedup state") {
    // kill the evolving feed INSIDE the v1 wave, so the v2 DDL (the
    // rename) and every v2 doc arrive only after the restart — the
    // dedup state built under v1 must seamlessly absorb the renamed
    // feed, and cross-version line ownership (a v2 doc with a lower
    // doc_id taking a v1 doc's line) must come out identical to the
    // uninterrupted run
    def rows(inc: IncrementalLineDedup) =
      inc.lines(spark).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val events = CdcAnalytics.evoDocWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc16-resume").toString
    val oneShot = rows(CdcAnalytics.runEvoDocPipeline(spark, events,
      s"$tmp/ref_state", s"$tmp/ref_ckpt", events.size.toLong))
    val ddl2 = events.indexWhere(_.contains("\"version\":2"))
    assert(ddl2 > 2, "fixture drift: no v2 DDL mid-stream")
    val cut = 1 + (ddl2 - 1) / 2 // inside the v1 wave
    val phaseA = events.take(cut)
    val phaseB = events.head +: events.drop(cut) // reconnect: current (v1) schema first
    CdcAnalytics.runEvoDocPipeline(spark, phaseA,
      s"$tmp/state", s"$tmp/ckpt", phaseA.size.toLong)
    val resumed = rows(CdcAnalytics.runEvoDocPipeline(spark, phaseB,
      s"$tmp/state", s"$tmp/ckpt", phaseB.size.toLong))
    assert(resumed.nonEmpty && resumed == oneShot,
      "resume across the rename DDL diverges from the one-shot run")
  }

  test("qc17: an outage inside the cross-DDL delete wave resumes to the one-shot IVF state") {
    // the delete wave retracts vectors INSERTED under v1 using
    // v2-shaped payloads; the kill lands mid-wave, so some tombstones
    // commit before the outage and the rest arrive through a resumed
    // v2 connection — the composed index must come out identical to
    // the uninterrupted run (and to the no-deletes run MINUS exactly
    // the retracted vectors)
    import graft.operators.KMeansLloyd
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), KMeansLloyd.quantize(col("embedding")).as("xi"))
    val (baseAssigned, cents, _) = KMeansLloyd.runTracked(
      vecs.where(col("vec_id") % 5 =!= 4), "vec_id", k = 4, iters = 2)
    def summary(inc: IncrementalIvf): Seq[Seq[Any]] =
      graft.queries.Vectors.ivfCompositionSummary(baseAssigned, inc.members(spark))
        .collect().map(_.toSeq).toSeq
    val events = CdcAnalytics.evoVecWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc17-resume").toString
    val oneShot = summary(CdcAnalytics.runEvoVecPipeline(spark, events,
      s"$tmp/ref_state", s"$tmp/ref_ckpt", events.size.toLong, cents))
    assert(oneShot.nonEmpty)

    val firstDel = events.indexWhere(_.contains("\"event_type\":\"delete\""))
    val ddl2 = events.indexWhere(_.contains("\"version\":2"))
    assert(ddl2 > 1 && firstDel > ddl2, "fixture drift: need deletes after the v2 DDL")
    val cut = firstDel + 1 + (events.size - firstDel - 1) / 2 // mid-delete-wave
    assert(cut > firstDel && cut < events.size, "fixture drift: delete wave too small to cut")
    val phaseA = events.take(cut)
    // reconnect: the CURRENT (v2) schema is re-announced at stream head
    val phaseB = events(ddl2) +: events.drop(cut)
    CdcAnalytics.runEvoVecPipeline(spark, phaseA,
      s"$tmp/state", s"$tmp/ckpt", phaseA.size.toLong, cents)
    val resumed = summary(CdcAnalytics.runEvoVecPipeline(spark, phaseB,
      s"$tmp/state", s"$tmp/ckpt", phaseB.size.toLong, cents))
    assert(resumed == oneShot,
      "resume inside the cross-DDL delete wave diverges from the one-shot run")

    // the retraction is exactly the % 20 == 4 streamed set: the same
    // feed WITHOUT its delete wave must carry precisely those vectors
    // on top of the one-shot run's surviving streamed membership
    val noDel = events.filterNot(_.contains("\"event_type\":\"delete\""))
    val full = CdcAnalytics.runEvoVecPipeline(spark, noDel,
      s"$tmp/nodel_state", s"$tmp/nodel_ckpt", noDel.size.toLong, cents)
    val retracted = full.members(spark)
      .where(col("vec_id") % 20 === 4).count()
    assert(retracted > 0, "fixture drift: no vectors in the delete set")
    val survivors = oneShot.map(_(2).asInstanceOf[Long]).sum // Σ n_new
    assert(full.members(spark).count() == survivors + retracted)
  }

  test("qc18: the served search sees wire-fed survivors and never a retracted vector") {
    // the oracle hash (Verify) pins the exact top-3 lists; this drill
    // pins the two properties that MAKE the search the gate — every
    // query answers (3 rows each), at least one neighbor is a
    // wire-inserted survivor (the index composition is live), and no
    // retracted vector ever surfaces (the tombstone path holds at
    // serve time)
    import org.apache.spark.sql.functions.col
    val res = CdcAnalytics.evolvingIvfServingSearchOverCdc(spark, dir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(res.length == 15, s"expected 3 neighbors x 5 queries, got ${res.length}")
    assert(res.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 5L, 6L))
    assert(!res.exists(_._2 % 20 == 4),
      "a retracted vector surfaced as a neighbor")
    assert(res.exists(_._2 % 5 == 4),
      "no wire-inserted survivor among the neighbors — composition not live")
  }

  test("qc19: the persisted wire-built index reloads in a fresh session and serves identically") {
    // the oracle hash (Verify) pins the reloaded top-3 lists to qc18's
    // oracle; this drill pins the persistence mechanics — the entry's
    // served result equals qc18's in-session result row-for-row (same
    // feed, same queries; only save → fresh-session load in between)
    val direct = CdcAnalytics.evolvingIvfServingSearchOverCdc(spark, dir)
      .collect().map(_.toSeq).toSeq
    val reloaded = CdcAnalytics.persistedIvfServingSearchOverCdc(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(reloaded.nonEmpty && reloaded == direct,
      "fresh-session serve from the persisted index diverges from the in-session search")
  }

  test("qc20: an outage inside the v2 (widened) wave resumes to the one-shot snapshot") {
    // the type change: cents is int under v1, bigint under v2, every
    // v2 value boosted past Int.MaxValue. The cut lands INSIDE the v2
    // wave, so boosted inserts AND the cross-width delete wave arrive
    // through a reconnected v2 stream onto state accumulated under
    // the narrow width — the resumed snapshot must equal the one-shot
    // run's exactly
    def rows(snap: CdcSnapshotTable): Seq[Seq[Any]] =
      snap.snapshot(spark).orderBy("custkey").collect().map(_.toSeq).toSeq
    val events = CdcAnalytics.typedBalWorkloadEvents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("qc20-resume").toString
    val oneShot = rows(CdcAnalytics.runTypedBalPipeline(spark, events,
      s"$tmp/ref_snap", s"$tmp/ref_ckpt", events.size.toLong))
    assert(oneShot.nonEmpty)
    // the widened width is load-bearing in the final state: some
    // surviving cents exceed Int.MaxValue
    assert(oneShot.exists(_(1).asInstanceOf[Long] > Int.MaxValue.toLong),
      "fixture drift: no surviving value needs the widened type")

    val ddl2 = events.indexWhere(_.contains("\"version\":2"))
    assert(ddl2 > 1, "fixture drift: no v2 DDL mid-stream")
    val cut = ddl2 + 1 + (events.size - ddl2 - 1) / 2 // inside the v2 wave
    val phaseA = events.take(cut)
    // reconnect: the CURRENT (v2, bigint) schema re-announced at head
    val phaseB = events(ddl2) +: events.drop(cut)
    CdcAnalytics.runTypedBalPipeline(spark, phaseA,
      s"$tmp/snap", s"$tmp/ckpt", phaseA.size.toLong)
    val resumed = rows(CdcAnalytics.runTypedBalPipeline(spark, phaseB,
      s"$tmp/snap", s"$tmp/ckpt", phaseB.size.toLong))
    assert(resumed == oneShot,
      "resume across the type change diverges from the one-shot run")
  }
}
