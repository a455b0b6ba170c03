package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the PLAN_NOTES.md plan properties: the
  * scale-critical physical-plan shapes must survive query edits. */
class PlanSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q03 pushes filters into the parquet scan and prunes columns") {
    val p = plan("q03_filter_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_discount)") ||
      p.contains("GreaterThanOrEqual(l_discount,0.05)"), p.take(800))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double>"))
  }

  test("q06 broadcasts the dimension joins") {
    val p = plan("q06_join_multiway")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q25 compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q25_global_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q13 aggregates with a partial (map-side) phase") {
    val p = plan("q13_agg_hash")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(800))
  }

  test("q23c computes quartiles without a global window") {
    // q23's NTILE is inherently single-task; the 2-pass variant must
    // never plan a Window — only a sketch aggregation + broadcast map
    val p = plan("q23c_quartiles_2pass")
    assert(!p.contains("Window"), p.take(800))
  }

  test("q10b pure range join plans bucketed, with no BNLJ") {
    // a bare range predicate would compile to BroadcastNestedLoopJoin;
    // the IntervalJoin bucketing must keep it a hash equi-join
    val p = plan("q10b_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("q67 top-k retrieval plans TakeOrderedAndProject over hash aggs") {
    // the LIMIT 20 must never become a global sort, and BM25's per-doc
    // and per-term stats must be partial-agg hash aggregations (the
    // broadcast 1-row/5-row cross joins ARE the intended shape — only
    // the top-k and agg structure are load-bearing here)
    val p = plan("q67_bm25_retrieval")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert("HashAggregate".r.findAllIn(p).length >= 4, p.take(800))
  }

  test("q54/q55 banded near-dup plans contain no all-pairs join") {
    // the whole point of the composed pipelines (VERDICT item 1): every
    // join is an equi-join on band buckets or keys — the n² shapes
    // (BroadcastNestedLoopJoin / CartesianProduct) must never appear
    for (q <- Seq("q54_banded_neardup", "q55_lsh_cosine_neardup")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("round-8 entries plan no all-pairs join") {
    // q112 family: gram-hash windows + equi-joins only; q113/q114:
    // node-keyed self-joins and beam-edge equi-joins; q115: the shared
    // LSH candidate equi-join + node-keyed margin windows. None may
    // degrade to an n-squared physical shape.
    for (q <- Seq("q112_duplicate_spans", "q112b_multiscale_dup_spans",
        "q113_nndescent_knn_graph", "q114_graph_ann_search",
        "q115_margin_pair_mining")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("q128 layered search plans no all-pairs join") {
    // layer builds are node-keyed self-joins, descent hops are beam-
    // edge equi-joins, the L2 entry is an equi-join on the member
    // index (a shared literal entry would constant-fold a hop into a
    // BNLJ — the q114 lesson)
    val p = plan("q128_hnsw_layered_search")
    assert(!p.contains("BroadcastNestedLoopJoin"), "q128 plans a BNLJ")
    assert(!p.contains("CartesianProduct"), "q128 plans a cartesian product")
  }

  test("q118 broadcasts the model and selects via TakeOrderedAndProject") {
    // the 1024-row log-ratio table must broadcast onto the feature
    // stream (never shuffle the corpus on bucket), the top-40 must be
    // a bounded TakeOrderedAndProject, and nothing may plan an
    // unbounded cartesian (the 1-row totals broadcast is a permitted
    // single-row BNLJ, the q97 shape)
    val p = plan("q118_dsir_selection")
    assert(p.contains("BroadcastHashJoin"), s"lr join not broadcast: ${p.take(1200)}")
    assert(p.contains("TakeOrderedAndProject"), s"top-40 not bounded: ${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), s"q118 plans a cartesian: ${p.take(1200)}")
  }

  test("q112's shared-gram test plans as ONE gram computation, no join-back") {
    // the round-8 window form: the >=2-distinct-docs judgment must not
    // re-derive the gram relation for a probe side (one Generate from
    // the documents scan, zero joins before the island windows)
    val p = plan("q112_duplicate_spans")
    assert("Generate explode".r.findAllIn(p).length == 1,
      s"gram explode planned more than once: ${p.take(1200)}")
    assert(!p.contains("BroadcastHashJoin"),
      s"dup set join-back reappeared: ${p.take(1200)}")
  }

  test("q119 dedups lines with one chunker pass and zero joins") {
    // the keep decision is a window over the chunk text (q112 doctrine:
    // a filter relation derived from the probe itself must not become
    // an agg-then-join-back that re-scans the probe) — the plan must
    // hold exactly one Generate (the chunk posexplode) and no join of
    // any kind
    val p = plan("q119_line_dedup")
    assert("Generate ".r.findAllIn(p).length == 1,
      s"chunker planned more than once: ${p.take(1200)}")
    assert(!p.contains("Join"), s"q119 plans a join: ${p.take(1200)}")
  }

  test("q120 selects canonicals with a partial-phase argmax, no window") {
    // the keep decision must stay an O(1)-state max(struct) agg with a
    // map-side partial phase (a million-member boilerplate cluster
    // contributes one struct per task) — never a per-cluster sorted
    // window, never an n² shape
    val p = plan("q120_canonical_selection")
    assert(!p.contains("Window"), s"q120 plans a window: ${p.take(1200)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q120 plans an all-pairs join: ${p.take(1200)}")
    assert("Aggregate".r.findAllIn(p).length >= 2,
      s"q120 lacks a partial agg phase: ${p.take(1200)}")
  }

  test("q121 assigns splits with a per-row bucket and equi-joins only") {
    // the cluster label relation joins the doc scan by key (broadcast
    // or hash — never nested-loop), the bucket is a pure projection,
    // and nothing may plan a window over the corpus
    val p = plan("q121_cluster_split")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q121 plans an all-pairs join: ${p.take(1200)}")
    assert(!p.contains("Window"), s"q121 plans a window: ${p.take(1200)}")
  }

  test("q122's round stages broadcast the weights and stay equi-join shaped") {
    // the QueryDef's output is a driver-built trajectory table (its
    // plan shows nothing), so the guard inspects the two per-round
    // stages directly: the 65-row weight vector must BROADCAST onto
    // the checkpointed feature relation (never shuffle the corpus on
    // bucket), and the misclassified-set join back must stay a hash
    // equi-join — no window, no n² shape anywhere
    val feats = Pipeline.perceptronFeatures(spark, dir, 64).localCheckpoint(true)
    val w0 = spark.createDataFrame((0 to 64).map(b => (b.toLong, 0L))).toDF("b", "w")
    val miss = Pipeline.perceptronMissDocs(feats, w0)
    val pm = miss.queryExecution.executedPlan.toString
    assert(pm.contains("BroadcastHashJoin"), s"weights not broadcast: ${pm.take(1200)}")
    assert(!pm.contains("Window") && !pm.contains("BroadcastNestedLoopJoin") &&
      !pm.contains("CartesianProduct"), pm.take(1200))
    val pd = Pipeline.perceptronDelta(feats, miss.localCheckpoint(true))
      .queryExecution.executedPlan.toString
    assert(!pd.contains("BroadcastNestedLoopJoin") && !pd.contains("CartesianProduct"),
      pd.take(1200))
    assert("HashAggregate".r.findAllIn(pd).length >= 2,
      s"delta agg lacks a partial phase: ${pd.take(1200)}")
  }

  test("q122b scores with broadcast final weights — no window, no n² shape") {
    // unlike q122, the apply query's output IS an engine relation:
    // the final 65-row weight vector must broadcast onto the feature
    // scan and both aggs keep partial phases
    val p = plan("q122b_perceptron_apply")
    assert(p.contains("BroadcastHashJoin"), s"weights not broadcast: ${p.take(1200)}")
    assert(!p.contains("Window") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(1200))
  }

  test("q124's composed DAG stays equi-join shaped end to end") {
    // four stages composed (quality gate → cluster keep-best → line
    // dedup → shard manifest): the composition must not introduce any
    // n² shape — joins are doc_id-keyed, the keep-best argmax is an
    // agg, the only windows are line dedup's chunk-keyed pass
    val p = plan("q124_curation_pipeline")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q124 plans an all-pairs join: ${p.take(1200)}")
  }

  test("q18b computes top-k per group without a window sort") {
    // the point of the bounded-buffer Aggregator: no Window node, and
    // the aggregation must run with a partial (map-side) phase so the
    // shuffle carries ≤ k-entry buffers, not rows
    val p = plan("q18b_topk_heap")
    assert(!p.contains("Window"), p.take(1200))
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p.take(1200))
  }

  test("q98 caps each source without a window sort") {
    // a hot domain is where the window form degenerates (one partition
    // holds the domain's full document set); the cap must stay a
    // bounded-buffer aggregation with a map-side partial phase
    val p = plan("q98_source_cap")
    assert(!p.contains("Window"), p.take(1200))
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"q98 lacks a partial ObjectHashAggregate phase:\n${p.take(1200)}")
  }

  test("q100 joins bucketed tables with no exchange and no sort on either side") {
    // the entire point of the physical bucket layout: the sort-merge
    // join must consume the buckets' partitioning and sort order
    // directly — an Exchange or Sort on a join input means the layout
    // was ignored and the join re-shuffled the fact table
    val p = plan("q100_bucket_join")
    assert(p.contains("SortMergeJoin"), s"q100 did not plan a sort-merge join:\n${p.take(1200)}")
    assert(p.contains("Bucketed: true"), s"q100 scan is not bucketed:\n${p.take(1200)}")
    assert(!p.contains("Exchange hashpartitioning(o_orderkey") &&
      !p.contains("Exchange hashpartitioning(l_orderkey"),
      s"q100 re-shuffles a bucketed side:\n${p.take(2000)}")
    // tree printing is root-first: the join's inputs print AFTER the
    // join line, and the only legitimate Sort (the final orderBy) is an
    // ancestor printed before it — so any Sort past the join line is a
    // sort of a bucketed input
    assert(p.indexOf("Sort ", p.indexOf("SortMergeJoin")) == -1,
      s"q100 sorts a bucketed join input:\n${p.take(2000)}")
  }

  test("q100b statically prunes the scan to one bucket") {
    // the literal key must cut the file set to the single bucket that
    // can hold it — reading all 8 means bucket pruning silently died
    val p = plan("q100b_bucket_pruned_lookup")
    assert(p.contains("SelectedBucketsCount: 1 out of 8"),
      s"q100b reads more than one bucket:\n${p.take(1500)}")
  }

  test("q102 injects dynamic partition pruning into the fact scan") {
    // the runtime dim must become a dynamicpruningexpression in the
    // partitioned scan's PartitionFilters — without it the layout is
    // decoration and every day's files are read
    val p = plan("q102_dynamic_partition_pruning")
    assert(p.contains("dynamicpruning"),
      s"q102 scan has no dynamic pruning subquery:\n${p.take(1500)}")
  }

  test("q103 joins on the salt and never broadcasts") {
    // the salt only spreads skew if it is a JOIN key of a SHUFFLE join:
    // a broadcast join would erase the shuffle the salt exists to
    // spread, and a salt-free key list means the helper regressed
    val p = plan("q103_salted_skew_join")
    assert(p.contains("SortMergeJoin") && p.contains("__salt"),
      s"q103 lost the salted shuffle join:\n${p.take(1500)}")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"q103 broadcast a side of the salted join:\n${p.take(1500)}")
  }

  test("q104 peels with semi joins only — degree filter never goes nested-loop") {
    val p = plan("q104_kcore_peel")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q104 planned a nested loop:\n${p.take(1500)}")
  }

  test("q105 runs the bucketed local skyline pass before the global window") {
    // the global window is single-task by design; it must only ever see
    // per-bucket frontier survivors, so the parallel __bk-partitioned
    // pass has to exist in the plan (dropping it silently turns the
    // query into one task over the whole table)
    val p = plan("q105_skyline")
    assert(p.contains("__bk"), s"q105 lost the local skyline pass:\n${p.take(1500)}")
    assert("Window".r.findAllIn(p).length >= 2, p.take(1500))
  }

  test("q106 folds row-level checks into conditional aggs — no nested loop anywhere") {
    val p = plan("q106_data_quality_audit")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q106 planned a nested loop:\n${p.take(1500)}")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(1500))
  }

  test("q107 drift agg shuffles only type×bin cells — no window, no nested loop") {
    val p = plan("q107_distribution_drift")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q107 planned a nested loop:\n${p.take(1500)}")
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q109 folds the weighted sample map-side — no window over the corpus") {
    val p = plan("q109_weighted_sample")
    assert(!p.contains("Window"), s"q109 sorted the corpus in a window:\n${p.take(1500)}")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p.take(1500))
  }

  test("q110 computes OLS sums in one partial-agg pass — no join, no window") {
    val p = plan("q110_trend_regression")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"q110 should be a single agg pass:\n${p.take(1500)}")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(1500))
  }

  test("q101 probes the Bloom filter in the fact scan, before the join") {
    // the reduction only pays off if might_contain runs scan-side: it
    // must appear in the plan, and appear BEFORE (above) the join's own
    // key comparison — i.e. inside the lineitem filter, not as a
    // post-join residual
    val p = plan("q101_bloom_reduced_join")
    assert(p.contains("might_contain"), s"q101 lost its Bloom probe:\n${p.take(1200)}")
    val joinIdx = math.max(p.indexOf("HashJoin"), p.indexOf("SortMergeJoin"))
    assert(joinIdx >= 0, s"q101 plans no join:\n${p.take(1200)}")
    assert(p.indexOf("might_contain", joinIdx) >= 0,
      s"q101's Bloom probe is not on a join input:\n${p.take(2000)}")
  }

  test("q99 triangle census is equi-joins only — wedge closure never goes nested-loop") {
    // compact-forward's bound rests on the wedge pair join (on src) and
    // the closure join (on (v, w)) staying hash equi-joins; a BNLJ here
    // would re-create the all-pairs neighborhood scan the orientation
    // exists to avoid
    val p = plan("q99_neardup_triangles")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q99 plans a BNLJ:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "q99 plans a cartesian product")
  }

  test("q70 pairs only within k-means cells — equi-join on cell, no all-pairs") {
    // SemDeDup's scale claim rests on the pair join being keyed by the
    // cell id; a planner regression to BNLJ/cartesian would silently
    // reintroduce the O(n²) pair space the clustering exists to avoid
    val p = plan("q70_semantic_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q70 plans a BNLJ:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), s"q70 plans a cartesian product")
  }

  test("q48b/q73b compute per-query ANN top-k without a window sort") {
    // the TopKRows scale form: no Window node anywhere, and the
    // aggregation must run with a partial (map-side) phase so the
    // shuffle carries ≤ k-entry buffers per query per task, never the
    // full scored stream
    for (q <- Seq("q48b_ann_topk_heap", "q73b_ivf_multiprobe", "q78_ivf_sq8")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q plans a Window:\n${p.take(1200)}")
      assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
        s"$q lacks a partial ObjectHashAggregate phase:\n${p.take(1200)}")
    }
  }

  test("q83 folds kNN scores map-side — no window over the scored stream") {
    // the vote window runs over the queries-sized vote relation (fine);
    // the SCORED stream (queries × n rows) must be reduced by the
    // partial TopKRows aggregation, never window-sorted
    val p = plan("q83_knn_label_vote")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"q83 lacks a partial ObjectHashAggregate phase:\n${p.take(1200)}")
  }

  test("q84 trailing window is an explode-to-offsets equi-join — no nested-loop join") {
    // the 0..6-day window membership must be computed by EXPLODING each
    // user-day into its 7 covered window days (the q10b bucketize
    // doctrine) and hash-aggregating on the window day — a `datediff
    // BETWEEN` join against a day dimension is non-equi and plans a
    // BroadcastNestedLoopJoin (every user-day × every calendar day)
    val p = plan("q84_rolling_active_users")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q84 plans a nested-loop join:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "q84 plans a cartesian product")
    assert(p.contains("Generate"),
      s"q84 lost its explode-to-window-days Generate:\n${p.take(1200)}")
  }

  test("q88 composes the incremental index without a nested-loop join or window") {
    // base training is the guarded q68 shape; the arrival waves are
    // map-only assignments (centroids as plan literals) appended to
    // parquet state — the composed summary must stay hash-agg + one
    // union, with no BNLJ/cartesian anywhere and no window at all
    val p = plan("q88_incremental_ivf")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q88 plans a nested-loop join:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "q88 plans a cartesian product")
    assert(!p.contains("Window"), s"q88 plans a window:\n${p.take(1200)}")
  }

  test("q85 classifies with centroids as literals — no join, no window") {
    // nearest-centroid assignment must be a pure map over the scan
    // (centroids are plan literals); any Join or Window means the
    // centroid relation leaked into the distributed plan
    val p = plan("q85_centroid_classify")
    assert(!p.contains("Join"), s"q85 plans a join:\n${p.take(1200)}")
    assert(!p.contains("Window"), s"q85 plans a window:\n${p.take(1200)}")
  }

  test("q71b full-outer interval join stays an equi-join — no BNLJ") {
    val p = plan("q71b_attribution_audit")
    assert(p.contains("FullOuter"), s"q71b is not a full-outer join:\n${p.take(1200)}")
    assert(!p.contains("BroadcastNestedLoopJoin"), "q71b plans a BNLJ")
    assert(!p.contains("CartesianProduct"), "q71b plans a cartesian product")
  }

  test("q89 scores ADC by broadcast LUT join + map-side fold — no window, no BNLJ") {
    // the PQ encode must be map-only (codewords as plan literals), the
    // per-query LUT must BROADCAST onto the code stream (a shuffle join
    // keyed on (sub, code) would ceiling parallelism at m·ksub keys),
    // and the top-k must ride the TopKRows partial aggregation — the
    // scored stream is never window-sorted
    val p = plan("q89_pq_adc")
    assert(!p.contains("Window"), s"q89 plans a window:\n${p.take(1200)}")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q89 plans a BNLJ:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "q89 plans a cartesian product")
    assert(p.contains("BroadcastHashJoin"), s"q89 LUT join is not broadcast:\n${p.take(1200)}")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"q89 lacks a partial ObjectHashAggregate phase:\n${p.take(1200)}")
  }

  test("q90 IVFPQ: probe×LUT broadcasts onto the code scan — no window, no BNLJ") {
    // the composed index must keep both component disciplines: the
    // probe-restricted ADC join is a BroadcastHashJoin (the member/code
    // side never shuffles), scoring folds map-side, and the top-k rides
    // TopKRows — a Window or BNLJ anywhere means a component regressed
    for (q <- Seq("q90_ivfpq", "q96_ivfpq_residual")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q plans a window:\n${p.take(1200)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ:\n${p.take(1200)}")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(p.contains("BroadcastHashJoin"), s"$q probe/LUT join is not broadcast:\n${p.take(1200)}")
      assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
        s"$q lacks a partial ObjectHashAggregate phase:\n${p.take(1200)}")
    }
  }

  test("q91 encodes with merges as plan literals — no join, no window") {
    // the trained merge table must fold into the replace() chain as
    // literals: a Join means the merge table leaked into the
    // distributed plan, a Window means the per-source totals stopped
    // being a hash agg
    val p = plan("q91_bpe_encode")
    assert(!p.contains("Join"), s"q91 plans a join:\n${p.take(1200)}")
    assert(!p.contains("Window"), s"q91 plans a window:\n${p.take(1200)}")
  }

  test("q92/q93/q94 stay equi-join shaped — no nested loop over data relations") {
    // q92's three unrolled iterations are edges⋈ranks equi-joins and
    // q93's spine join is keyed on (type, hour) — neither may degrade
    // to a nested loop
    for (q <- Seq("q92_pagerank", "q93_gap_fill")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ:\n${p.take(1200)}")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
    // q94 carries the q77 scalar-broadcast idiom (crossJoin of 1-row
    // aggregates — a benign O(1)-per-row BNLJ), but its CORPUS join
    // (documents ⋈ rates) must be a BroadcastHashJoin: shuffling the
    // corpus on source for a 20-row rate table would be the defect
    val p94 = plan("q94_mixture_sample")
    assert(p94.contains("BroadcastHashJoin"), s"q94 rate join is not broadcast:\n${p94.take(1200)}")
    assert(!p94.contains("CartesianProduct"), "q94 plans a cartesian product")
  }

  test("q95 pre-filters then folds top-k map-side — no window over the scored stream") {
    // the predicate must restrict candidates BEFORE scoring (an equi-
    // join with the doc_id set) and the top-k must ride TopKRows; the
    // only nested loop allowed is the 5-row query broadcast (the q48
    // scoring idiom)
    val p = plan("q95_filtered_ann")
    assert(!p.contains("Window"), s"q95 plans a window:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "q95 plans a cartesian product")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"q95 lacks a partial ObjectHashAggregate phase:\n${p.take(1200)}")
  }

  test("q46b prefix join plans equi-joins only — the lossless form never falls back to n²") {
    // q46 is the deliberate all-pairs recall oracle; q46b exists so the
    // EXACT same result has a scale-shaped plan: inverted-index
    // equi-join on prefix tokens + sort-merge/hash verify joins, never
    // a nested-loop or cartesian pair space
    val p = plan("q46b_jaccard_prefix_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q46b plans a BNLJ:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), s"q46b plans a cartesian product:\n${p.take(1200)}")
  }

  test("q97 top-20 is TakeOrderedAndProject over hash aggs — no global sort") {
    // the pair relation is vocab²-bounded but still the biggest thing
    // in the plan; its top-20 must never become a full sort, and the
    // only nested loops allowed are the two 1-row total broadcasts
    val p = plan("q97_pmi_pairs")
    assert(p.contains("TakeOrderedAndProject"), s"q97 plans a global sort:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "q97 plans a cartesian product")
    assert(!p.contains("Window"), s"q97 plans a window:\n${p.take(1200)}")
  }

  test("q73/q73b probe sides broadcast — member scan never shuffles on cell") {
    // the IVF probe join must be a BroadcastHashJoin (queries are a
    // handful of rows): a shuffle join keyed on cell would ceiling
    // parallelism at k and move the whole member table
    for (q <- Seq("q73_ivf_ann", "q73b_ivf_multiprobe", "q78_ivf_sq8")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q probe join is not broadcast:\n${p.take(1200)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("q125 suffix sort: one scan, one range exchange, zero joins pre-rank") {
    // the suffix relation is linear×Depth in the corpus; its global
    // order must come from ONE range repartition of that relation (the
    // q122b lesson applies: the ranked DF is RDD-backed, so the guard
    // inspects the pre-rank stage directly)
    val p = SuffixArray.sortedSuffixesOf(graft.Tables(spark, dir, "documents"))
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"), s"q125 lost its range exchange:\n${p.take(1200)}")
    assert(!p.contains("Join"), s"q125's suffix stage plans a join:\n${p.take(1200)}")
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"q125's suffix stage scans more than once:\n${p.take(1200)}")
  }

  test("q125 adjacency is a rank equi-join — never nested-loop") {
    // neighbours in suffix order meet on rk = rk+1; a BNLJ here would
    // be the all-pairs suffix comparison the rank order exists to avoid
    val p = SuffixArray.adjacentLcpOf(graft.Tables(spark, dir, "documents"))
      .queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"q125's adjacency join is not an equi-join:\n${p.take(1200)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q125 plans an all-pairs join:\n${p.take(1200)}")
  }
}
