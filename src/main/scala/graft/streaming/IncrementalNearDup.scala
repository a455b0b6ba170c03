package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.DedupGroups
import graft.queries.LlmText

/** Incremental (streaming) near-dup dedup: the production shape where
  * documents arrive continuously (e.g. from the CDC source) and dedup
  * state accumulates per micro-batch instead of re-running the batch
  * funnel over the whole corpus.
  *
  * State, materialized as parquet under `statePath` (the foreachBatch
  * analog of a state store — append-only, survives restarts):
  *  - `bands/` — the LSH band index (doc_id, band, key), the thing new
  *    docs probe;
  *  - `sets/`  — per-doc sorted shingle-hash arrays for exact verify;
  *  - `pairs/` — accumulated verified near-dup pairs.
  *
  * Per micro-batch: new docs' signatures/bands are computed with the
  * SAME stages as the batch pipeline (LlmText.nearDupState / bandKeys /
  * verifyPairs — one code path, two run modes), candidates
  * are new-vs-(state ∪ new) band-bucket joins (never old-vs-old: each
  * pair is discovered exactly once, in the batch where its later doc
  * arrives), verified exactly, and appended. Because a doc's band keys
  * are a pure function of its text, the accumulated pair set after N
  * batches equals the batch pipeline's pair set over the same docs —
  * `IncrementalNearDupSpec` pins stream-accumulated dedup groups to the
  * batch q57 result on the same fixture slice.
  *
  * Scale notes: per-batch cost is (batch bands) ⋈ (band index) — an
  * equi-join on the bucket key, linear in batch size; the hot-bucket cap
  * ([[LlmText.HotBucketCap]]) is applied to the combined index per
  * batch, so a bucket that goes hot stops emitting NEW candidates
  * (pairs found while it was small are retained — the standard
  * streaming-LSH tradeoff, noted here rather than hidden).
  */
final class IncrementalNearDup(statePath: String) {

  private def readStateOr(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** foreachBatch hook: `batch` needs (doc_id, text). */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val docs = batch.select(col("doc_id"), col("text"))
      .localCheckpoint(true) // micro-batch sources are not re-scannable

    // one scan + one shuffle yields both the signature arrays and the
    // minhash components (LlmText.nearDupState), materialized once for
    // the batch's several uses
    processState(LlmText.nearDupState(docs).localCheckpoint(true), batchId)
  }

  /** Shared-scan entry: `state` must be `LlmText.nearDupState` rows for
    * exactly the batch's documents. The wire path ([[processBatch]])
    * computes it per micro-batch — that's the streaming contract; a
    * BATCH caller replaying a known corpus in waves (q66) can instead
    * compute the full-corpus state ONCE and feed each wave its slice,
    * halving the number of document scans without touching semantics:
    * state rows are per-doc pure functions of the text (group-by
    * doc_id), so slicing a precomputed relation is row-identical to
    * recomputing per wave. */
  def processState(state: DataFrame, batchId: Long): Unit = {
    val spark = state.sparkSession
    val newSets = state.select("doc_id", "hs", "nbg")
    val newBands = LlmText.bandKeys(state, 8, 2)

    val oldBands = readStateOr(spark, s"$statePath/bands", newBands.schema)
    val allBands = oldBands.unionByName(newBands)
    // hot-bucket cap over the combined index (see class doc)
    val smallKeys = allBands.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bsz"))
      .where(col("bsz") <= LlmText.HotBucketCap)
      .select(col("band"), col("key"))
    val probe = newBands.join(smallKeys, Seq("band", "key"), "left_semi")
    val index = allBands.join(smallKeys, Seq("band", "key"), "left_semi")
    // new-vs-all: canonicalize so (a, b) is found once regardless of
    // which side is the new doc
    val cand = probe.as("x").join(index.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()

    val oldSets = readStateOr(spark, s"$statePath/sets", newSets.schema)
    val verified = LlmText.verifyPairs(cand, oldSets.unionByName(newSets))
    val oldPairs = readStateOr(spark, s"$statePath/pairs", verified.schema)
    val fresh = verified.join(oldPairs.select("doc_a", "doc_b"),
      Seq("doc_a", "doc_b"), "left_anti")

    // every append is anti-joined against existing state, so a replayed
    // micro-batch (foreachBatch retries after failure) is a no-op
    // instead of doubling rows — idempotent-by-construction restart
    // semantics without a transactional table format
    val freshSets = newSets.join(oldSets.select("doc_id"), Seq("doc_id"), "left_anti")
    val freshBands = newBands.join(oldBands.select("doc_id").distinct(),
      Seq("doc_id"), "left_anti")
    fresh.write.mode("append").parquet(s"$statePath/pairs")
    freshBands.write.mode("append").parquet(s"$statePath/bands")
    freshSets.write.mode("append").parquet(s"$statePath/sets")
  }

  /** Compact a state directory tree: per-batch appends accumulate one
    * small file set per micro-batch, which at production batch rates
    * degrades every subsequent state read — standard streaming-state
    * hygiene is periodic compaction (e.g. every N batches from the
    * foreachBatch hook). Rewrites each table to `parts` files. */
  def compact(spark: SparkSession, parts: Int = 8): Unit =
    Seq("pairs", "bands", "sets").foreach { t =>
      val dir = s"$statePath/$t"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) {
        val snap = spark.read.parquet(dir).localCheckpoint(true)
        snap.coalesce(parts).write.mode("overwrite").parquet(dir)
      }
    }

  /** Accumulated verified near-dup pairs (doc_a, doc_b, jaccard). */
  def pairs(spark: SparkSession): DataFrame =
    spark.read.parquet(s"$statePath/pairs")

  /** Dedup groups over everything ingested so far — same contract as
    * the batch q57 (doc_id → component-min rep). */
  def groups(spark: SparkSession): DataFrame =
    DedupGroups.components(pairs(spark))
}
