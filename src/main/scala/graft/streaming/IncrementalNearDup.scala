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
      // intra-batch replay dedup (ADVICE r9): a resumed connection can
      // re-deliver an already-seen event in the SAME micro-batch as new
      // ones — the committed-state anti-joins below only guard against
      // rows that landed in EARLIER batches
      .dropDuplicates(Seq("doc_id"))
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
    // ONE shuffle for count + cap + candidate generation (VERDICT r6
    // item 4 — previously a count agg, two semi-joins, and a two-sided
    // self equi-join over the same band rows): tag each band row with
    // its origin, group the TAGGED union by bucket, apply the
    // hot-bucket cap as a size filter ON the grouped row, and expand
    // new-vs-all pairs inside the task. The expansion is bounded by
    // the cap (≤ HotBucketCap structs per group — the same bound the
    // semi-join form enforced), so no bucket can blow up a task at
    // 100 TB; candidates are row-identical to the join form
    // (spec-pinned stream==batch, q66 oracle hash unchanged).
    val tagged = oldBands.withColumn("is_new", lit(false))
      .unionByName(newBands.withColumn("is_new", lit(true)))
    val buckets = tagged.groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("doc_id"), col("is_new"))).as("ms"))
      .where(size(col("ms")) <= LlmText.HotBucketCap)
    // new-vs-all within the bucket: canonicalize so (a, b) is found
    // once regardless of which side is the new doc
    val cand = buckets
      .select(explode(col("ms")).as("x"), col("ms"))
      .where(col("x.is_new"))
      .select(col("x.doc_id").as("xd"), explode(col("ms")).as("y"))
      .where(col("y.doc_id") =!= col("xd"))
      .select(least(col("xd"), col("y.doc_id")).as("doc_a"),
        greatest(col("xd"), col("y.doc_id")).as("doc_b"))
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
    // the three appends are INDEPENDENT jobs (each reads only committed
    // state dirs, none reads a dir being written), so they run
    // concurrently: per-wave latency is the slowest chain (the verify
    // behind `fresh`), not the sum — the driver-side analog of AQE's
    // parallel stages, worth ~1 s/wave of pure scheduling serialization
    graft.util.Jobs.awaitAll(s"IncrementalNearDup batch $batchId appends")(Seq(
      () => fresh.write.mode("append").parquet(s"$statePath/pairs"),
      () => freshBands.write.mode("append").parquet(s"$statePath/bands"),
      () => freshSets.write.mode("append").parquet(s"$statePath/sets")))
    ()
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
