package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r10 item 5: automatic, crash-safe compaction for the
  * incremental states. Pins (a) the policy actually FIRES from the
  * batch hooks once a state dir crosses the file threshold, with
  * content identical to an uncompacted run and the file count bounded
  * across a long drill; (b) every kill-mid-compaction crash window of
  * the swap protocol heals on next access with no rows lost. */
class CompactionPolicySpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("policy fires mid-stream, bounds the file count, and preserves content") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toVector
    assert(docs.size >= 300)

    // low threshold: with appends bounded at ≤ NumBuckets files each,
    // wave 2+ must trip the policy — a long drill of 8 insert waves
    // plus interleaved retract waves
    val autoDir = tmp("auto-compact")
    val auto = new IncrementalLineDedup(autoDir, autoCompactFiles = 8)
    val manual = new IncrementalLineDedup(tmp("no-compact"), autoCompactFiles = Int.MaxValue)
    val waves = docs.grouped(math.max(docs.size / 8, 1)).toSeq
    import spark.implicits._
    for ((w, i) <- waves.zipWithIndex) {
      val batch = w.toDF("doc_id", "text")
      auto.processBatch(batch, i.toLong)
      manual.processBatch(batch, i.toLong)
      if (i % 3 == 2) { // interleaved deletes: every doc_id % 31 == i % 31
        val dels = w.map(_._1).filter(_ % 31 == i % 31).toDF("doc_id")
        auto.retractBatch(dels, 100L + i)
        manual.retractBatch(dels, 100L + i)
      }
    }
    assert(auto.compactionCount > 0,
      "auto-compaction never fired across an 8-wave drill at threshold 8")
    assert(manual.compactionCount == 0)

    // content identical to the never-compacted twin
    def out(inc: IncrementalLineDedup) = inc.lines(spark).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(auto) == out(manual))

    // the whole point: the auto-compacted state's file count is bounded
    // (≤ buckets per dir + the current wave's appends), while the
    // uncompacted twin accumulated per-wave files all drill long
    val autoFiles = StateFiles.parquetCount(s"$autoDir/chunks")
    assert(autoFiles <= 2 * StateLayout.NumBuckets,
      s"auto-compacted chunks/ holds $autoFiles files")
  }

  test("every kill-mid-compaction window heals with no rows lost") {
    import spark.implicits._
    val base = tmp("crash-windows")
    val dirA = s"$base/chunks"
    val rows = (0L until 500L).map(i => (i, s"p-$i")).toDF("doc_id", "payload")
    val schema = rows.schema
    StateLayout.append(rows, dirA, Seq("doc_id"))
    val want = StateLayout.read(spark, dirA, schema).collect().map(_.toSeq).toSet
    val fs = new org.apache.hadoop.fs.Path(dirA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def P(p: String) = new org.apache.hadoop.fs.Path(p)

    // window 1: crashed while WRITING tmp (live dir intact, partial tmp)
    fs.mkdirs(P(StateLayout.tmpDir(dirA)))
    assert(StateLayout.read(spark, dirA, schema).collect().map(_.toSeq).toSet == want)
    assert(!fs.exists(P(StateLayout.tmpDir(dirA))), "stale tmp not cleaned")

    // window 2: crashed BETWEEN the two renames (dir moved aside, tmp
    // complete) — recovery must roll FORWARD to the compacted bytes
    StateLayout.overwriteCompacted(
      StateLayout.read(spark, dirA, schema).localCheckpoint(true),
      dirA, Seq("doc_id"), 4) // a real compaction first, to get compact bytes
    val compacted = StateLayout.read(spark, dirA, schema).collect().map(_.toSeq).toSet
    assert(compacted == want)
    // simulate: copy dir to tmp, rename dir to old  ⇒ exactly the
    // post-first-rename on-disk state
    org.apache.hadoop.fs.FileUtil.copy(fs, P(dirA), fs,
      P(StateLayout.tmpDir(dirA)), false, spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(P(dirA), P(StateLayout.oldDir(dirA))))
    assert(!fs.exists(P(dirA)))
    assert(StateLayout.read(spark, dirA, schema).collect().map(_.toSeq).toSet == want,
      "roll-forward recovery lost rows")
    assert(fs.exists(P(dirA)) && !fs.exists(P(StateLayout.oldDir(dirA))) &&
      !fs.exists(P(StateLayout.tmpDir(dirA))))

    // window 3: crashed after install but before dropping the old bytes
    org.apache.hadoop.fs.FileUtil.copy(fs, P(dirA), fs,
      P(StateLayout.oldDir(dirA)), false, spark.sparkContext.hadoopConfiguration)
    assert(StateLayout.read(spark, dirA, schema).collect().map(_.toSeq).toSet == want)
    assert(!fs.exists(P(StateLayout.oldDir(dirA))), "stale old dir not cleaned")

    // window 2b: tmp vanished too (only old remains) — roll back
    assert(fs.rename(P(dirA), P(StateLayout.oldDir(dirA))))
    assert(StateLayout.read(spark, dirA, schema).collect().map(_.toSeq).toSet == want,
      "roll-back recovery lost rows")
  }
}
