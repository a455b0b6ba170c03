package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.queries.LlmText
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r10 item 1: the per-batch candidate stage must be bounded by
  * the BATCH (touched buckets), not the accumulated state. This spec
  * grows a full-corpus band index, then probes it with a tiny batch and
  * pins (a) the committed-index rows entering the candidate shuffle to
  * the touched-bucket volume — a small fraction of the state — and
  * (b) that the restriction is a broadcast semi-join (the index is
  * scanned, never shuffled, on the probe side). Results-parity of the
  * restricted form is carried by [[IncrementalNearDupSpec]]'s
  * stream==batch pin and the q66/q66b/qc7 oracle hashes, which all run
  * through the same [[IncrementalNearDup.candidateUnion]]. */
class IncrementalNearDupScaleSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("old band rows entering the candidate shuffle are bounded by touched buckets") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val statePath = java.nio.file.Files
      .createTempDirectory("inc-neardup-scale").toString
    val inc = new IncrementalNearDup(statePath)
    // grown state: the WHOLE corpus committed in one wave
    inc.processBatch(docs, 0L)

    // a small batch of 5 fresh docs whose text is copied from distinct
    // corpus docs — identical text ⇒ identical band keys ⇒ every batch
    // bucket is GUARANTEED present in the state (worst case for the
    // bound: nothing prunes to zero)
    val batch = docs.orderBy("doc_id").limit(5)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val newBands = LlmText.bandKeys(
      LlmText.nearDupState(batch).localCheckpoint(true), 8, 2)

    val oldBands = StateLayout.read(spark, s"$statePath/bands",
      newBands.schema)
    val stateRows = oldBands.count()
    assert(stateRows > 1000, s"state too small to be meaningful: $stateRows")
    val nBuckets = newBands.select("band", "key").distinct().count()

    val tagged = inc.candidateUnion(oldBands, newBands)
    val oldInUnion = tagged.where(!col("is_new")).count()

    // the claim under test: committed rows entering the shuffle ≤
    // touched-bucket volume. With 5 docs × 8 bands the batch touches
    // ≤ 40 buckets; even if every one were at the hot cap the union
    // would hold ≤ nBuckets × HotBucketCap committed rows — and must be
    // a small fraction of the full index, which the old full-union form
    // shuffled wholesale every batch.
    assert(oldInUnion > 0, "semi-join pruned everything — batch buckets should hit state")
    assert(oldInUnion <= nBuckets * LlmText.HotBucketCap,
      s"old rows in union $oldInUnion exceed touched-bucket hard bound")
    assert(oldInUnion < stateRows / 4,
      s"old rows in union $oldInUnion not a small fraction of state $stateRows — " +
        "the candidate stage is shuffling the accumulated index again")

    // the restriction must not itself shuffle the index: batch buckets
    // are broadcast, the index side streams through a broadcast
    // semi-join
    val plan = tagged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast semi-join in plan:\n$plan")
  }
}
