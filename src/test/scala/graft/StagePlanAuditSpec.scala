package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.StageAudit

/** Per-STAGE physical-plan audit for driver-composed entries (VERDICT
  * r11 item 6 — RegistryPlanAuditSpec's documented limitation): that
  * spec sees each entry's FINAL executedPlan, but for driver-composed
  * entries the final plan is a LocalRelation over collected leg rows
  * (q129/q130) or a scan of materialized state (the streaming twins).
  * Here those entries run under StageAudit capture, and the SAME
  * CartesianProduct/BNLJ assertions apply to every constituent stage:
  * the q129/q130 sweep legs, every connected-components min-label
  * round, and every per-batch state append of every parquet-state
  * streaming twin (StateLayout.append records the incoming frame, so
  * the captured plan is the batch's full upstream DAG). q131 needs no
  * hook — its legs union into the final plan RegistryPlanAuditSpec
  * already checks. The RocksDB continuous-plan twins (q66f/g/j/k,
  * q119f/g, qc8-qc10, qc14) are covered by StateStoreNearDupSpec's
  * one-shuffle plan assertions on the streaming query itself.
  */
class StagePlanAuditSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** The one DECLARED brute stage: q129's exact ground truth is the
    * q48 brute shape (tiny query side broadcast against the corpus IS
    * the semantics) — same doctrine as RegistryPlanAuditSpec's
    * entry-level allowlist. */
  private val bnljAllowedStages = Set("q129:truth3-brute")

  private def auditCaptured(captured: Seq[(String, String)]): Unit = {
    val offenders = captured.flatMap { case (label, plan) =>
      val cart =
        if (plan.contains("CartesianProduct")) Seq(s"$label: CartesianProduct")
        else Nil
      val bnlj =
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowedStages(label))
          Seq(s"$label: unlisted BroadcastNestedLoopJoin")
        else Nil
      cart ++ bnlj
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q129/q130 sweep legs and CC rounds carry no cartesian or unlisted BNLJ") {
    val (_, captured) = StageAudit.capturing {
      SparkEntry.queries("q129_ann_operating_sweep")(spark, dir).collect()
      SparkEntry.queries("q130_dedup_threshold_sweep")(spark, dir).collect()
    }
    val labels = captured.map(_._1)
    // coverage floor — if a refactor drops the record() calls, the
    // audit must fail loudly rather than pass on an empty capture
    assert((1 to 4).forall(p => labels.contains(s"q129:ivf-p$p")),
      s"missing ivf legs in $labels")
    assert(Seq(2, 4, 8).forall(b => labels.contains(s"q129:beam-b$b-final")),
      s"missing beam legs in $labels")
    assert(labels.contains("q129:truth3-brute"))
    assert(Seq(35, 50, 70).forall(t => labels.contains(s"q130:filter-t$t")),
      s"missing q130 legs in $labels")
    assert(labels.exists(_.startsWith("cc:minlabel-round")),
      s"no CC rounds captured in $labels")
    auditCaptured(captured)
  }

  test("every parquet-state streaming twin's per-batch plans are clean") {
    // the full parquet-state twin family — each drives ≥1 micro-batch
    // through StateLayout.append, so capture sees each batch's whole
    // upstream DAG (candidate joins included, not just the write)
    val twins = Seq(
      "q66_incremental_dedup", "q66b_incremental_dedup_retract",
      "q88_incremental_ivf", "q88b_incremental_ivf_retract",
      "q112s_incremental_dup_spans", "q112r_dup_spans_retract",
      "q112bs_incremental_multiscale_spans",
      "q119s_incremental_line_dedup",
      "q126s_incremental_substring_removal", "q126r_substring_removal_retract",
      "q133s_incremental_report_card", "q133r_report_card_retract")
    twins.foreach { name =>
      val (_, captured) = StageAudit.capturing {
        SparkEntry.queries(name)(spark, dir).collect()
      }
      val appends = captured.filter(_._1.startsWith("state-"))
      assert(appends.nonEmpty, s"$name: no state append captured — " +
        "either the twin stopped using StateLayout or the hook was dropped")
      auditCaptured(captured)
    }
  }
}
