package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-WIDE physical-plan audit: the blanket form of the targeted
  * PlanSpec guards. Every registered entry's compiled plan is checked —
  * a future entry with an accidental n² shape fails here without
  * needing its own guard.
  *
  *  - `CartesianProduct` is NEVER acceptable (even q11's declared cross
  *    join plans as a broadcast nested-loop, not a cartesian).
  *  - `BroadcastNestedLoopJoin` is acceptable ONLY on the frozen
  *    allowlist below: the declared cross join (q11), the deliberate
  *    brute-force recall oracles (q42/q46/q47/q48/q48b/q83/q95 — a
  *    tiny query side broadcast against the corpus IS the declared
  *    semantics), and the crossJoin(broadcast(scalar-or-spine)) shape
  *    (a 1-row corpus total or a ≤Depth-row length spine broadcast
  *    under a non-equi or true predicate — bounded by construction,
  *    the VERDICT-audited pattern in q23c/q26/q62/q63/q64/q67/q69/
  *    q77/q94/q97/q118/q125b/q127).
  *
  * Composed wire entries (qc*) are excluded: constructing them runs
  * the full mock-server pipeline, and their FINAL plan is just an
  * aggregation over materialized state — the interesting plans are
  * audited via their batch twins.
  *
  * SCOPE (ADVICE r9, closed in r12): this spec inspects each entry's
  * FINAL executedPlan. For driver-composed entries the final plan is a
  * trivial LocalRelation over collected rows (q129/q130: per-leg
  * sweeps collected then toDF) or a scan of materialized temp state
  * (q133s and the other streaming twins) — their constituent per-leg /
  * per-batch plans are audited by StagePlanAuditSpec via the
  * StageAudit capture hook (same assertions, per recorded stage), on
  * top of the TARGETED PlanSpec guards.
  */
class RegistryPlanAuditSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private val bnljAllowed = Set(
    "q11_join_cross",
    "q42_cosine_topk", "q46_ngram_jaccard", "q47_cosine_neardup",
    "q48_ann_topk", "q48b_ann_topk_heap", "q83_knn_label_vote",
    "q95_filtered_ann",
    "q23c_quartiles_2pass", "q26_union", "q62_heavy_hitters",
    "q63_tfidf_top_terms", "q64_contamination", "q67_bm25_retrieval",
    "q69_lm_surprisal", "q77_mixture_weights", "q94_mixture_sample",
    "q97_pmi_pairs", "q118_dsir_selection", "q125b_top_repeated_substrings",
    "q127_hybrid_rrf",
    // r10: q134 shares q69's allowlisted shape exactly — the 1-row
    // corpus-total crossJoin(broadcast(...)) feeding the LM table
    "q134_curriculum_phases")

  test("no registered entry plans a cartesian product or an unlisted BNLJ") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.allDefs.filterNot(_.name.startsWith("qc")).foreach { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct"))
        offenders += s"${q.name}: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(q.name))
        offenders += s"${q.name}: unlisted BroadcastNestedLoopJoin"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the BNLJ allowlist carries no dead entries") {
    // an allowlisted entry that no longer plans a BNLJ should be
    // removed — a stale allowlist silently re-admits the shape later
    val stale = bnljAllowed.filter { name =>
      !SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")
    }
    assert(stale.isEmpty, s"allowlisted but BNLJ-free now: $stale")
  }
}
