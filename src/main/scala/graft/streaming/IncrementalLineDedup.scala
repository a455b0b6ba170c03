package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.LlmText

/** Incremental duplicate-line removal (the q119 streaming twin, built
  * exactly like [[IncrementalDupSpans]]): docs arrive in micro-batches
  * and the chunk-occurrence state accumulates; the keep-first decision
  * and document reconstruction over everything seen so far are
  * computable at any point without re-chunking old documents.
  *
  * State (parquet under `statePath`): `chunks/` — one row per 10-token
  * line occurrence (doc_id, ck, chunk), the [[LlmText.lineChunks]]
  * relation, append-only.
  *
  * Per-batch work is chunk-and-APPEND only — no cross-doc work at all.
  * The corpus-wide "is this line a repeat?" judgment is deferred to
  * [[lines]], one window pass over the accumulated state. Because
  * keep-first ranks by (doc_id, ck) — not arrival order — a LATER
  * batch delivering an earlier doc id retroactively takes ownership of
  * a line and flips the previous owner's copy to dropped: emission is
  * arrival-order independent by construction, which is what lets the
  * twin share batch q119's DuckDB oracle verbatim.
  *
  * Replay safety: appends are anti-joined on doc_id against committed
  * state, so a foreachBatch retry is a no-op.
  */
final class IncrementalLineDedup(statePath: String) {

  private val chunksDir = s"$statePath/chunks"

  private def readStateOr(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def emptyChunks(spark: SparkSession): DataFrame =
    LlmText.lineChunks(
      spark.createDataFrame(Seq.empty[(Long, String)]).toDF("doc_id", "text"))

  /** foreachBatch hook: `batch` needs (doc_id, text). */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("text"))
      // intra-batch replay dedup (ADVICE r9): a resumed connection can
      // re-deliver an already-seen event in the SAME micro-batch as new
      // ones — the committed-state anti-join below only guards against
      // rows that landed in EARLIER batches
      .dropDuplicates(Seq("doc_id"))
      .localCheckpoint(true) // micro-batch sources are not re-scannable
    // replay guard BEFORE chunking: state rows are per-doc, so
    // filtering doc rows against seen doc_ids equals filtering chunk
    // rows — and a replayed doc skips chunking entirely
    val old = readStateOr(spark, chunksDir, emptyChunks(spark).schema)
    val fresh = docs.join(old.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    LlmText.lineChunks(fresh).write.mode("append").parquet(chunksDir)
  }

  /** Line-dedup stats + reconstruction over every doc seen so far —
    * row-identical to batch q119 on the same corpus. */
  def lines(spark: SparkSession): DataFrame =
    LlmText.lineDedupStats(
      readStateOr(spark, chunksDir, emptyChunks(spark).schema))
      .select(col("doc_id"), col("orig_chunks"), col("kept_chunks"), col("new_text"))

  /** Bound the state-file count (small-file compaction between waves). */
  def compact(spark: SparkSession, parts: Int): Unit = {
    val cur = spark.read.parquet(chunksDir).localCheckpoint(true)
    cur.repartition(parts).write.mode("overwrite").parquet(chunksDir)
  }
}
