package graft.queries

import graft.QueryDef

/** The composed CDC-to-analytics entries: queries whose INPUT is not a
  * fixture parquet scan but the materialized state of a CDC stream
  * that itself ran through the full wire path (mock server → source →
  * registry → projection → exactly-once upsert). See
  * [[graft.streaming.CdcAnalytics]] for the design and the
  * oracle-checkability argument.
  */
object CdcComposed {

  def defs: Seq[QueryDef] = Seq(
    QueryDef("qc1_cdc_materialized_agg",
      // End-to-end: scripted insert/update_before/update_after/delete
      // workload (derived from `customer`) → maxscale-cdc stream →
      // CdcSnapshotTable exactly-once materialization → q13-shape
      // aggregation over the final state. The DuckDB oracle computes
      // the same final state INDEPENDENTLY from `customer` (no CDC
      // anywhere), so the hash gate certifies the whole pipeline:
      // framing, decode, projection, binlog ordering, upsert/delete
      // semantics, and exactly-once delivery.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.materializedAgg(s, d)),
      Some("WITH final AS (SELECT c_custkey, c_nationkey, " +
        "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + " +
        "CASE WHEN c_custkey % 3 = 0 THEN 10000 ELSE 0 END AS cents " +
        "FROM customer WHERE c_custkey % 5 <> 0) " +
        "SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS n_cust, " +
        "CAST(SUM(cents) AS BIGINT) AS sum_cents " +
        "FROM final GROUP BY 1 ORDER BY 1")),

    QueryDef("qc2_cdc_incremental_line_dedup",
      // End-to-end: every fixture document INSERTed over the wire in
      // md5-shuffled order (mock server → maxscale-cdc source →
      // registry → projection) feeding IncrementalLineDedup's
      // append-only chunk state per micro-batch, then the q119
      // keep-first emission over the accumulated state. The oracle is
      // batch q119's, computed straight from `documents` with no CDC
      // anywhere — ONE hash gate certifies the connector (framing,
      // decode, JSON string escaping, exactly-once delivery) AND the
      // dedup state's arrival-order independence together.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.incrementalLineDedupOverCdc(s, d)),
      Some(LlmText.LineDedupOracleSql)),

    QueryDef("qc3_cdc_incremental_ivf",
      // End-to-end: the connector feeding the ANN layer. The base 80%
      // trains the deterministic Lloyd's index from the warehouse
      // (training is not a CDC concern); the arrival 20% is INSERTed
      // over the wire in md5-shuffled order — embeddings as exact
      // Float round-trip strings — into IncrementalIvf's map-only
      // assignment + idempotent append state, then the q88 composed-
      // index summary (per-cell base/new counts + retrain-due drift
      // flag) is emitted under q88's OWN oracle (computed from
      // `embeddings` with no CDC anywhere). One hash gate certifies
      // framing, decode, float round-tripping, exactly-once delivery
      // AND the index state's arrival-order independence together.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.incrementalIvfOverCdc(s, d)),
      Some(Vectors.IncrementalIvfOracleSql)),

    QueryDef("qc4_cdc_drift_monitor",
      // End-to-end: the connector feeding the MONITORING layer. Every
      // fixture event INSERTed over the wire in md5-shuffled order —
      // doubles as exact round-trip strings, timestamps as epoch-µs
      // longs, and the payload's type column renamed `etype` because
      // the CDC envelope itself uses `event_type` for the operation
      // (the real-MaxScale column-collision hazard, handled at the
      // feed boundary) — accumulated in a replay-guarded feed state,
      // then the UNCHANGED q107 PSI stage over the accumulated state,
      // under q107's OWN oracle (computed from `events` with no CDC
      // anywhere). Completes the qc-family: aggregation (qc1), dedup
      // (qc2), ANN (qc3), monitoring (qc4).
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.driftOverCdc(s, d)),
      Some(Behavioral.DriftPsiOracleSql)),

    QueryDef("qc5_cdc_report_card",
      // End-to-end: the connector feeding the REPORT layer. Every
      // fixture document INSERTed with its full metadata row over the
      // wire in md5-shuffled order into IncrementalReportCard's
      // append-only doc state, then the UNCHANGED q133 crosstab over
      // the accumulated state, under q133's OWN oracle (computed from
      // `documents` with no CDC anywhere). The retroactive dup-flip
      // (a later duplicate changes an already-ingested doc's flag) is
      // exactly what makes the shuffled wire order a real test. The
      // qc-family now covers agg (qc1), dedup (qc2), ANN (qc3),
      // monitoring (qc4), and reporting (qc5).
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.reportCardOverCdc(s, d)),
      Some(LlmText.ReportCardOracleSql)),

    QueryDef("qc6_cdc_dedup_retraction",
      // End-to-end DELETE retraction (VERDICT r9 item 1): qc2's insert
      // workload followed by deletes of doc_id % 7 == 0 over the wire,
      // routed into IncrementalLineDedup as chunk appends + tombstone
      // appends, then the q119 emission over the tombstone-filtered
      // state. The oracle is batch q119 RESTRICTED TO THE SURVIVORS
      // (computed from `documents` with no CDC anywhere): it matches
      // only if a deleted owner's lines are re-owned by the earliest
      // surviving claimant — keep-first rank over survivors — so the
      // hash gate certifies the connector's delete path AND the
      // state's retraction semantics at once. The kill/resume drill
      // (CdcAnalyticsSpec) cuts the binlog inside the delete section.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.lineDedupRetractionOverCdc(s, d)),
      Some(LlmText.lineDedupOracleSqlOver(
        s" WHERE doc_id % ${graft.streaming.CdcAnalytics.RetractMod} <> 0"))),

    QueryDef("qc7_cdc_neardup_retraction",
      // qc6's sibling for the NEAR-DUP layer: the same insert+delete
      // binlog over the wire, routed into IncrementalNearDup (inserts
      // = full banded accumulation per micro-batch, deletes = O(1)
      // tombstone appends), then the q57-shape dedup groups over the
      // survivors. Oracle = q66b's (banded chain + recursive-CTE
      // components over documents WHERE doc_id % 7 <> 0 — no CDC, no
      // retraction machinery): it matches only if a deleted doc's
      // edges vanished from BOTH pair sides and every component
      // re-formed (rep re-election, splits) exactly as a batch run
      // over the survivors. With qc6 this closes tombstone semantics
      // across the qc-family's two dedup layers; the kill/resume drill
      // (CdcAnalyticsSpec) cuts the binlog inside the delete section.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.nearDupRetractionOverCdc(s, d)),
      Some(LlmText.dedupGroupsOracleSqlOver(
        s"doc_id % ${graft.streaming.CdcAnalytics.RetractMod} <> 0"))),

    QueryDef("qc8_cdc_statestore_neardup",
      // The production streaming shape end to end, as ONE CONTINUOUS
      // plan with no foreachBatch: qc2's insert workload over the wire
      // (mock server → maxscale-cdc source → pre-registered-DDL
      // stateless projection) → PER-ROW band keys (LlmText.rowBandKeys,
      // the stateless prefix — no per-doc shuffle anywhere) →
      // flatMapGroupsWithState on RocksDB (point access per touched
      // bucket) → parquet file sink (exactly-once commit log), then the
      // q66 tail over the durable candidates (exact verify against the
      // lake shingle state, q57-shape groups). ONE shuffle in the whole
      // streaming plan; source offsets, RocksDB snapshots and sink log
      // all recover from the same checkpoint. Oracle = batch q57's
      // (recomputed from `documents`, no CDC anywhere), so the hash
      // gate certifies connector, per-row minhash recipe, state-store
      // candidate completeness and sink delivery in one bite.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.stateStoreNearDupOverCdc(s, d)),
      Some(LlmText.dedupGroupsOracleSqlOver(""))),

    QueryDef("qc9_cdc_statestore_line_dedup",
      // qc8's sibling on the SIMPLEST state: the same insert workload
      // as ONE CONTINUOUS plan — source → stateless projection →
      // per-row line chunking → flatMapGroupsWithState on RocksDB (the
      // q119f owner index) → parquet file sink — then the q119 keep
      // decision derived SOLELY from the durable owner events (min
      // fold; ownership only decreases). One shuffle in the whole
      // streaming plan (chunk occurrences onto their state
      // partitions). Oracle = batch q119's (computed from `documents`,
      // no CDC anywhere); with qc2 this pins foreachBatch and
      // continuous-plan forms of the same dedup to the same hash.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.stateStoreLineDedupOverCdc(s, d)),
      Some(LlmText.LineDedupOracleSql)),

    QueryDef("qc10_cdc_statestore_neardup_retract",
      // The retraction binlog through the CONTINUOUS plan: qc6/qc7's
      // insert+delete workload (inserts of every doc, then deletes of
      // doc_id % 7 == 0) through the qc8 shape on the q66g claimant
      // state — DELETEs flow through the SAME one-shuffle streaming
      // plan as inserts (a binlog DELETE carries the deleted row, so
      // its band keys are recomputed from the text and the tombstone
      // op lands on exactly the doc's 8 buckets with point access; no
      // foreachBatch routing split anywhere). Tail: order-free fold of
      // the durable op events to the surviving pairs (distinct pair
      // events minus pairs touching a tombstoned doc — both sets
      // monotone, no versioning needed), exact verify against the
      // SURVIVORS' shingle state, q57-shape groups. Oracle = q66b's
      // survivors-only banded chain (no CDC, no retraction machinery):
      // it matches only if deleted docs' edges vanished from both pair
      // sides and every component re-formed as a batch run over the
      // survivors. The kill/resume drill (CdcAnalyticsSpec) cuts the
      // binlog inside the DELETE section.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.stateStoreNearDupRetractionOverCdc(s, d)),
      Some(LlmText.dedupGroupsOracleSqlOverBr(
        s"doc_id % ${graft.streaming.CdcAnalytics.RetractMod} <> 0", 8, 2,
        maxBucket = Int.MaxValue))),

    QueryDef("qc11_cdc_bootstrap_gtid_handoff",
      // The 100 TB deployment seam: an existing corpus is never
      // replayed through the binlog. The near-dup state is BOOTSTRAPPED
      // by one distributed batch pass over the warehouse's historical
      // half (a map-only md5-key-range slice — no global sort, no
      // driver-side membership), and the stream subscribes FROM the
      // GTID frontier against a server that honors the resume position
      // (REQUEST-DATA db.table.v <gtid> — reference A4's gtid made
      // load-bearing), so the wire only ever carries the live half.
      // Oracle = the full-corpus batch q57 chain (no CDC, no bootstrap
      // machinery): a doc double-counted across the boundary, one
      // skipped by an off-by-one frontier, or any bootstrap-vs-stream
      // order dependence in the state breaks the hash. The spec
      // additionally asserts the server-side SKIP (eventsSent == the
      // live half) and drills a kill/resume whose checkpoint-adopted
      // GTID lands mid-live-half — committed events are never
      // re-streamed, unlike the replay-guard-absorbed full resends of
      // the qc2/qc7 drills.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.bootstrapHandoffOverCdc(s, d)),
      Some(LlmText.dedupGroupsOracleSqlOver(""))),

    QueryDef("qc12_cdc_reband_maintenance",
      // The q66h re-band migration inside a REAL maintenance window on
      // the wire — the lifecycle a year-long 100 TB dedup stream
      // actually goes through: wave 1 streams the even half of the
      // corpus into the near-dup state at the (8, 2) design; the
      // stream is STOPPED, the committed state is re-banded in place
      // to the higher-precision (4, 4) design from the signatures
      // sets/ retains (no corpus re-read, no binlog replay); a NEW
      // connection then resumes the binlog at (4, 4) with the odd
      // half plus DELETEs that reach back ACROSS the window into
      // wave-1 docs (cross-window retraction: the tombstone lands on
      // state built under the OLD design and already migrated).
      // Oracle = the full batch chain AT (4, 4) over the SURVIVORS
      // (dedupGroupsOracleSqlOverBr — no CDC, no migration, no
      // retraction machinery in it): the hash closes over the
      // connector, the migration's exactness, cross-window
      // retraction, and the new design's candidate semantics at once.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.nearDupMigrationOverCdc(s, d)),
      Some(LlmText.dedupGroupsOracleSqlOverBr(
        s"doc_id % ${graft.streaming.CdcAnalytics.RetractMod} <> 0", 4, 4))),

    QueryDef("qc13_cdc_widen_maintenance",
      // The q66i signature-WIDENING migration inside a maintenance
      // window on the wire, with the widening's one corpus pass
      // reading the CDC-MATERIALIZED replica — never the source table.
      // qc12 proves re-banding needs state alone; widening needs the
      // document TEXTS (new md5 salts), and at 100 TB the corpus must
      // already be in the lake: the SAME wire that feeds the dedup
      // state maintains the qc1 copy-on-write replica (keyed doc_id),
      // and the maintenance window reads its snapshot. Wave 1 streams
      // the even half at (8, 2) while materializing the replica; the
      // stream stops; widenMigrate extends the signatures to 32
      // components from the replica snapshot and re-indexes at (8, 4);
      // a NEW connection resumes with the odd half plus DELETEs
      // reaching back ACROSS the window (retraction against widened
      // state). Replica completeness is load-bearing (a missed doc
      // silently drops from sets/ at the migration join). Oracle = the
      // full batch chain at (8, 4) over the SURVIVORS — no CDC, no
      // replica, no migration machinery in it.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.nearDupWidenMigrationOverCdc(s, d)),
      Some(LlmText.dedupGroupsOracleSqlOverBr(
        s"doc_id % ${graft.streaming.CdcAnalytics.RetractMod} <> 0", 8, 4))),

    QueryDef("qc14_cdc_statestore_rebuild",
      // The state-store path's DESIGN-CHANGE move (VERDICT r11 item 1,
      // closing the loop qc12/qc13 leave open): the parquet twin
      // migrates in place, but the RocksDB store keys on opaque
      // xxhash64 bucket ids — there is nothing to re-band from — so
      // the production operation is a REBUILD from the lake replica
      // through a fresh checkpoint. Wave 1 streams the even half at
      // (8, 2) while the same wire maintains the qc1 copy-on-write
      // replica; at the maintenance window the NEW (8, 4)/32 store is
      // built by one map-only pass over replica.snapshot() into a
      // fresh checkpoint, then KILLED and RESUMED from it (the RocksDB
      // recovery drill runs inside the entry) before serving the live
      // wave — odd-half inserts plus DELETEs reaching back across the
      // window into rebuilt docs. Replica completeness is load-bearing
      // (a missed doc has no bands in the rebuilt store and the hash
      // gate fails). Oracle = the full batch chain at (8, 4) over the
      // SURVIVORS — q66i/q66k's oracle family, no CDC/replica/store
      // machinery anywhere in it.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.stateStoreRebuildOverCdc(s, d)),
      Some(LlmText.dedupGroupsOracleSqlOverBr(
        s"doc_id % ${graft.streaming.CdcAnalytics.RetractMod} <> 0", 8, 4,
        maxBucket = Int.MaxValue))),

    QueryDef("qc15_cdc_multitable_ddl_evolution",
      // Multi-table DDL EVOLUTION under load (VERDICT r11 item 8): two
      // tables subscribed concurrently in ONE unioned streaming query,
      // each receiving a mid-stream DDL that RENAMES its value column
      // (non-additive — projecting a v1 row under v2 loses the value),
      // with CDC DELETEs in each v2 wave reaching back across the DDL
      // boundary. The sources split micro-batches at the DDL event
      // (`splitBatchesAtDdl`), so the materializer binds `from_json`
      // ONCE per (batch, table) — version-purity is require()d per
      // batch. Which COLUMN each key's cents landed in IS the version
      // that projected it, so the oracle — both final states computed
      // straight from customer/orders, no CDC anywhere — certifies the
      // boundary split and per-version binding in one hash gate.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.multiTableDdlEvolution(s, d)),
      Some("SELECT * FROM (" +
        "SELECT 'balances' AS src, c_custkey AS k, " +
        "CASE WHEN c_custkey % 2 = 0 THEN CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS v1_cents, " +
        "CASE WHEN c_custkey % 2 = 1 THEN CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS v2_cents " +
        "FROM customer WHERE c_custkey % 10 <> 0 " +
        "UNION ALL " +
        "SELECT 'orders' AS src, o_orderkey AS k, " +
        "CASE WHEN o_orderkey % 32 = 0 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END AS v1_cents, " +
        "CASE WHEN o_orderkey % 32 <> 0 THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END AS v2_cents " +
        "FROM orders WHERE o_orderkey % 16 = 0 AND o_orderkey % 160 <> 0" +
        ") ORDER BY src, k")),

    QueryDef("qc16_cdc_evolving_line_dedup",
      // The DDL evolution crossing a STATEFUL layer (qc15 proves the
      // split on a snapshot materializer; this proves it where state
      // accumulates): the corpus table's text column is RENAMED
      // (text → body) mid-stream while the feed fills the incremental
      // line-dedup state — even docs arrive under v1, odd docs under
      // v2, each wave md5-shuffled, and line OWNERSHIP reaches across
      // the rename (a v2 doc with a lower doc_id takes a line from a
      // v1 doc). The sink adapts per batch with a column rename — the
      // split guarantees one schema per batch. A spanning batch would
      // project v1 rows under v2 with null body → null text → missing
      // chunks → the oracle hash fails. Oracle = batch q119's,
      // verbatim (qc2's exact gate — no CDC, no evolution in it).
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.evolvingLineDedupOverCdc(s, d)),
      Some(LlmText.LineDedupOracleSql)),

    QueryDef("qc17_cdc_evolving_ivf_retract",
      // DDL evolution × RETRACTION × the ANN state (closes the
      // stateful-layer evolution family: dedup was qc16, IVF is here):
      // the vector table's embedding column is RENAMED (emb →
      // embedding_csv) mid-arrival-stream while the feed fills the
      // incremental IVF member state, and a CDC DELETE wave reaches
      // BACK across the DDL — every deleted vector was inserted under
      // v1 and deleted under v2 (v2-shaped full-row delete payloads),
      // so the tombstone only lands on the right key if per-version
      // binding AND the batch split both hold. The sink adapts per
      // batch with a column rename (the qc16 adapter). Oracle = q88b's
      // survivors-only composed-index summary, computed from
      // `embeddings` with no CDC, no evolution anywhere in it.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.evolvingIvfRetractOverCdc(s, d)),
      Some(Vectors.incrementalIvfOracleSqlOver("vec_id % 20 <> 4"))),

    QueryDef("qc18_cdc_ivf_serving_search",
      // The SERVING side of qc17 — an index exists to answer queries,
      // so this entry closes the loop: the same evolved + retracted
      // index is rebuilt over the wire, then five base vectors are
      // SEARCHED through the composed base ∪ streamed-survivors
      // membership (nProbe = 1 into their own cell, q73's shape;
      // top-3 via the windowless bounded-heap aggregator, q73b's
      // form; full-precision vectors fetched from the warehouse by
      // vec_id — IDs in the index, vectors in the lake). The search
      // RESULT is the hash gate: a retracted vector surfacing as a
      // neighbor, a missed wire insert, or a v1-projected v2 row
      // would each change the top-3 lists. Oracle = the q73 search
      // tail over the a2 survivors, training CTEs shared verbatim
      // with q88/qc3, no CDC/evolution/retraction machinery in it.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.evolvingIvfServingSearchOverCdc(s, d)),
      Some(Vectors.ivfServingSearchOracleSql("vec_id % 20 <> 4"))),

    QueryDef("qc19_cdc_ivf_persist_reload",
      // INDEX PERSISTENCE on the wire path (VERDICT r12 item 2 — the
      // FAISS write_index/read_index analog, composed with the full
      // CDC lifecycle): qc17's evolving + retracting feed rebuilds the
      // incremental IVF over the wire; the composed inverted file
      // (base ∪ streamed survivors) + serving centroids are COMMITTED
      // to an AnnIndexStore directory (parquet components behind a
      // manifest commit record, written last); a FRESH SparkSession —
      // nothing cached, nothing trained — then opens the store and
      // answers qc18's serving search from it. Oracle = qc18's
      // verbatim: identical top-3 lists or the round trip is broken.
      // The batch twins are q139/q140/q141 (raw-PQ and residual-PQ
      // designs through the same store).
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.persistedIvfServingSearchOverCdc(s, d)),
      Some(Vectors.ivfServingSearchOracleSql("vec_id % 20 <> 4"))),

    QueryDef("qc20_cdc_type_widening",
      // real_type WIDTH evolution (VERDICT r12 item 4 — the evolution
      // shape qc15-qc17 left open): the cents column keeps its NAME
      // but widens int → bigint mid-stream (reference analog:
      // types.go:45-47 real_type refinement). v1 inserts int-ranged
      // values, v2 inserts values boosted past Int.MaxValue, and the
      // DELETE wave reaches back across the type change into
      // v1-inserted rows (and forward into boosted v2 rows) through
      // v2-shaped payloads. Per-version from_json binding + the
      // sink's widest-width state make it work; a batch mis-bound at
      // the v1 width would NULL every boosted payload (from_json
      // integer overflow) and the per-group SUM/MAX hash fails.
      // Oracle = the survivors' values recomputed from `customer`
      // with no CDC/evolution/width machinery in it. The resume
      // drill (CdcAnalyticsSpec) cuts INSIDE the v2 wave.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.typedWideningOverCdc(s, d)),
      Some("WITH b AS (SELECT c_custkey AS k, " +
        "CASE WHEN c_custkey % 2 = 1 THEN CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 3000000000 " +
        "ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END AS cents " +
        "FROM customer WHERE c_custkey % 10 <> 0 AND c_custkey % 10 <> 5) " +
        "SELECT k % 16 AS grp, COUNT(*) AS n_rows, " +
        "CAST(SUM(cents) AS BIGINT) AS sum_cents, " +
        "MIN(cents) AS min_cents, MAX(cents) AS max_cents " +
        "FROM b GROUP BY 1 ORDER BY 1")),

    QueryDef("qc21_cdc_curation_view",
      // The qc-family CAPSTONE: a CDC-fed MATERIALIZED CURATION VIEW.
      // One insert+delete binlog (every doc inserted md5-shuffled,
      // then deletes of doc_id % 7 == 0) maintains THREE states off
      // the same wire batch — the copy-on-write doc replica,
      // IncrementalNearDup's banded pair index, and
      // IncrementalLineDedup's chunk state — then q124's FOUR-layer
      // curation DAG (quality gate → cluster collapse keeping the
      // best qualified member → duplicate-line removal over the
      // survivor corpus → shard manifest) runs at emission over the
      // accumulated states through the SAME composition body as the
      // batch entry (Pipeline.curationManifestFrom — the two forms
      // cannot drift). Oracle = q124's composed SQL restricted to the
      // survivors, no CDC/retraction machinery in it: the single hash
      // certifies the connector's delete path, three states'
      // tombstone semantics, component re-formation, quality-gate
      // parity on the replica, and the post-collapse dup-pressure
      // recomputation at once. The kill/resume drill (CdcCurationSpec)
      // cuts the binlog inside the delete section and emits only
      // after the resumed run — all three states must recover from
      // one checkpoint.
      (s, d) => graft.util.Confs.withMicroBatch(s)(
        graft.streaming.CdcAnalytics.curationViewOverCdc(s, d)),
      Some(Pipeline.curationOracleSqlOver(
        s"doc_id % ${graft.streaming.CdcAnalytics.RetractMod} <> 0"))))
}
