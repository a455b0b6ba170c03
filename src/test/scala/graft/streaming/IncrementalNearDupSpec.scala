package graft.streaming

import graft.{SparkTestSession, Tables}
import graft.operators.DedupGroups
import graft.queries.LlmText
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental (CDC-fed) dedup funnel equals the batch pipeline:
  * documents streamed in three micro-batches through foreachBatch must
  * accumulate exactly the pairs and dedup groups the batch q57 computes
  * over the same fixture slice. */
class IncrementalNearDupSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("stream-accumulated dedup groups equal the batch q57 result") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.length >= 100, "fixture slice too small to be meaningful")

    val statePath = java.nio.file.Files
      .createTempDirectory("inc-neardup").toString
    val inc = new IncrementalNearDup(statePath)
    val stream = MemoryStream[(Long, String)]
    val query = stream.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode("append")
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, id: Long) =>
        inc.processBatch(batch, id))
      .start()
    try {
      // three uneven arrival waves, shuffled so near-dup partners land
      // in different batches (the cross-batch candidate path is the
      // thing under test)
      val shuffled = new scala.util.Random(11).shuffle(docs.toVector)
      for (wave <- Seq(
          shuffled.slice(0, 100), shuffled.slice(100, 350),
          shuffled.slice(350, shuffled.size))) {
        stream.addData(wave)
        query.processAllAvailable()
      }
    } finally query.stop()

    val streamPairs = inc.pairs(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val batchPairs = LlmText.bandedNearDupPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(streamPairs == batchPairs,
      s"pair sets differ: stream-only=${(streamPairs.keySet -- batchPairs.keySet).take(5)} " +
        s"batch-only=${(batchPairs.keySet -- streamPairs.keySet).take(5)}")

    val streamGroups = inc.groups(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchGroups = DedupGroups.components(LlmText.bandedNearDupPairs(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamGroups == batchGroups)

    // replayed micro-batch (foreachBatch retry semantics) is a no-op
    val before = (inc.pairs(spark).count(),
      spark.read.parquet(s"$statePath/sets").count(),
      spark.read.parquet(s"$statePath/bands").count())
    inc.processBatch(
      spark.createDataFrame(docs.take(100).toSeq).toDF("doc_id", "text"), 99L)
    val after = (inc.pairs(spark).count(),
      spark.read.parquet(s"$statePath/sets").count(),
      spark.read.parquet(s"$statePath/bands").count())
    assert(after == before, s"replay mutated state: $before -> $after")

    // compaction preserves content while bounding file counts
    inc.compact(spark, parts = 2)
    val compacted = inc.groups(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compacted == batchGroups)
    // bucketed layout: compaction bounds the dir at one file per
    // non-empty bucket (StateLayout.overwriteCompacted)
    val nFiles = StateFiles.parquetCount(s"$statePath/pairs")
    assert(nFiles <= StateLayout.NumBuckets, s"pairs not compacted: $nFiles files")
  }

  test("retraction: components re-form as a fresh run over the survivors, interleaved with ingest") {
    // the q66b drill, with the delete wave INTERLEAVED between insert
    // waves (the entry retracts after full ingest): tombstones for
    // doc_id % 7 == 0 land after wave 1, covering both already-seen
    // docs (edge removal) and not-yet-seen docs (tombstone-wins on a
    // later insert). The accumulated state must equal a FRESH ingest
    // of only the survivors, and differ from naively filtering the
    // full-corpus groups — i.e. retraction re-elects representatives
    // and splits components, it doesn't just drop rows.
    val st = LlmText.bigramStateCached(spark, dir).localCheckpoint(true)
    val statePath = java.nio.file.Files
      .createTempDirectory("inc-neardup-retract").toString
    val inc = new IncrementalNearDup(statePath)
    inc.processState(st.where(col("doc_id") % 2 === 0), 0L)
    inc.retractBatch(st.where(col("doc_id") % 7 === 0).select("doc_id"), 1L)
    inc.processState(st.where(col("doc_id") % 2 === 1), 2L)

    def groupsOf(i: IncrementalNearDup): Map[Long, Long] =
      i.groups(spark).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = groupsOf(inc)

    // a deleted doc appears nowhere — neither as member nor as rep
    assert(got.keySet.forall(_ % 7 != 0), "tombstoned doc still grouped")

    // fresh survivors-only ingest through the same engine
    val survPath = java.nio.file.Files
      .createTempDirectory("inc-neardup-surv").toString
    val inc2 = new IncrementalNearDup(survPath)
    inc2.processState(st.where(col("doc_id") % 7 =!= 0), 0L)
    assert(got == groupsOf(inc2),
      "retracted state diverges from a fresh survivors-only run")

    // load-bearing: naive filtering of the FULL-corpus components to
    // surviving members is NOT the same relation (some rep was deleted
    // or some component changed shape)
    val naive = DedupGroups.components(LlmText.bandedNearDupPairs(spark, dir))
      .where(col("doc_id") % 7 =!= 0)
      .groupBy(col("rep")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(naive != got,
      "fixture drift: deleting doc_id % 7 == 0 changed no component — retraction untested")

    // retraction replay is a no-op; tombstone-wins on a replayed insert
    inc.retractBatch(st.where(col("doc_id") % 7 === 0).select("doc_id"), 99L)
    assert(spark.read.parquet(s"$statePath/tombstones").count() ==
      st.where(col("doc_id") % 7 === 0).count())
    val setsBefore = spark.read.parquet(s"$statePath/sets").count()
    inc.processState(st.where(col("doc_id") % 7 === 0), 100L)
    assert(spark.read.parquet(s"$statePath/sets").count() == setsBefore,
      "a replayed insert of a deleted doc re-entered the state")
    assert(groupsOf(inc) == got)

    // compaction makes deletes physical (no tombstoned rows in any
    // table) while preserving the emitted relation
    inc.compact(spark, parts = 2)
    for (t <- Seq("sets", "bands"))
      assert(spark.read.parquet(s"$statePath/$t")
        .where(col("doc_id") % 7 === 0).count() == 0, s"$t not pruned")
    assert(spark.read.parquet(s"$statePath/pairs")
      .where(col("doc_a") % 7 === 0 || col("doc_b") % 7 === 0).count() == 0,
      "pairs not pruned")
    assert(groupsOf(inc) == got)
  }
}
