package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.queries.LlmText

/** Incremental substring-level dedup (the q112 streaming twin): docs
  * arrive in micro-batches and the gram-occurrence state accumulates;
  * duplicate-SPAN statistics over everything seen so far are computable
  * at any point without re-gramming old documents.
  *
  * State (parquet under `statePath`, the q66/q88 foreachBatch-analog of
  * a state store):
  *  - `grams/` — one row per word-n-gram occurrence
  *    (doc_id, n, n_tokens, pos, h), the [[LlmText.dupSpanGrams]]
  *    relation, append-only.
  *
  * Unlike pair-based near-dup ([[IncrementalNearDup]]), there is no
  * candidate generation at all: a batch only TOKENIZES its own docs and
  * appends (linear in batch size, one write). The cross-document "is
  * this gram shared?" decision is deferred to [[spans]], where it is a
  * single hash agg over the accumulated state keyed on (n, h) — a gram
  * of an old doc becomes duplicated the moment a later doc repeats it,
  * with no per-batch old-vs-new join. That ordering is what makes the
  * final emission arrival-order independent by construction: state is a
  * pure union of per-doc pure functions of text.
  *
  * Replay safety: appends are anti-joined on doc_id against the
  * committed state, so a foreachBatch retry is a no-op (the
  * [[IncrementalNearDup]] idempotence doctrine).
  */
final class IncrementalDupSpans(statePath: String, n: Int = 5) {

  private val gramsDir = s"$statePath/grams"

  private def readStateOr(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** foreachBatch hook: `batch` needs (doc_id, text). */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val grams = LlmText.dupSpanGrams(
      batch.select(col("doc_id"), col("text"))
        .localCheckpoint(true), // micro-batch sources are not re-scannable
      n)
    val old = readStateOr(spark, gramsDir, grams.schema)
    grams.join(old.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(gramsDir)
  }

  /** Duplicate-span stats over every doc seen so far — row-identical to
    * batch q112 on the same corpus (the stream==batch hash-gate claim:
    * same [[LlmText.dupSpanStats]] stage, same state rows). */
  def spans(spark: SparkSession): DataFrame =
    LlmText.dupSpanStats(
      readStateOr(spark, gramsDir,
        LlmText.dupSpanGrams(
          spark.createDataFrame(Seq.empty[(Long, String)]).toDF("doc_id", "text"),
          n).schema))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"), col("n_tokens"))

  /** Bound the state-file count (small-file compaction between waves). */
  def compact(spark: SparkSession, parts: Int): Unit = {
    val cur = spark.read.parquet(gramsDir).localCheckpoint(true)
    cur.repartition(parts).write.mode("overwrite").parquet(gramsDir)
  }
}
