package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Tables}

/** VERDICT r11 item 7 — the compaction policy AT THE TIER WHERE FILE
  * COUNTS ACTUALLY CLIMB: CompactionPolicySpec proves the trigger and
  * every kill-mid-compaction window at fixture scale with a lowered
  * threshold; this probe drills the PRODUCTION threshold
  * (StateLayout.AutoCompactFiles = 256, 16-file bucketed appends) over
  * tmp/sf1 (50k docs) across 52 micro-batches with interleaved
  * retractions and ONE injected kill-mid-compaction crash window
  * mid-drill.
  *
  * Claims printed (recorded in PLAN_NOTES):
  *  - the policy FIRES (file counts genuinely climb past 256 at sf1
  *    batch cadence — ~16 appends per trip);
  *  - the state-dir file count is BOUNDED across the whole drill
  *    (never exceeds threshold + one append + the recovery window's
  *    transient copy; ends ≤ 2×NumBuckets after the last trip has
  *    room to fire);
  *  - the output hash is UNCHANGED vs a never-compacted twin fed the
  *    identical batch sequence.
  *
  * Run: `sbt "Test/runMain graft.streaming.CompactionScaleProbe [sfDir]"`
  */
object CompactionScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nBatches = 52
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    println(s"PROBE n_docs=${docs.count()} batches=$nBatches " +
      s"threshold=${StateLayout.AutoCompactFiles}")

    // session scratch root (shutdown-hook cleaned) — two 50k-doc state
    // dirs per run would otherwise accumulate in /tmp (the ADVICE r11
    // class)
    def tmp(p: String) = graft.util.Scratch.dir(p)
    val autoDir = tmp("compact-sf1-auto")
    val auto = new IncrementalLineDedup(autoDir) // PRODUCTION threshold
    val twin = new IncrementalLineDedup(tmp("compact-sf1-twin"),
      autoCompactFiles = Int.MaxValue)

    val fs = new org.apache.hadoop.fs.Path(autoDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def P(p: String) = new org.apache.hadoop.fs.Path(p)
    val chunksDir = s"$autoDir/chunks"

    var maxFiles = 0
    var crashInjected = false
    for (i <- 0 until nBatches) {
      val batch = docs.where(pmod(col("doc_id"), lit(nBatches)) === i)
      auto.processBatch(batch, i.toLong)
      twin.processBatch(batch, i.toLong)
      if (i % 7 == 6) { // interleaved CDC DELETEs reaching back
        val dels = docs.where(pmod(col("doc_id"), lit(97)) === i % 97)
          .select(col("doc_id"))
        auto.retractBatch(dels, 1000L + i)
        twin.retractBatch(dels, 1000L + i)
      }
      // one kill-mid-compaction mid-drill: reproduce the between-renames
      // on-disk state (tmp complete, live dir moved aside) right after
      // the first policy firing, then CONTINUE the drill — the next
      // access must roll forward and the stream must not notice
      if (!crashInjected && auto.compactionCount > 0) {
        org.apache.hadoop.fs.FileUtil.copy(fs, P(chunksDir), fs,
          P(StateLayout.tmpDir(chunksDir)), false,
          spark.sparkContext.hadoopConfiguration)
        require(fs.rename(P(chunksDir), P(StateLayout.oldDir(chunksDir))))
        crashInjected = true
        println(s"PROBE crash_injected_after_batch=$i")
      }
      val nf = StateFiles.parquetCount(chunksDir)
      maxFiles = math.max(maxFiles, nf)
      if (i % 10 == 9) println(s"PROBE batch=$i chunk_files=$nf " +
        s"compactions=${auto.compactionCount}")
    }

    val bound = StateLayout.AutoCompactFiles + 2 * StateLayout.NumBuckets
    println(s"PROBE compactions=${auto.compactionCount} " +
      s"max_chunk_files=$maxFiles bound=$bound " +
      s"final_chunk_files=${StateFiles.parquetCount(chunksDir)}")
    require(crashInjected, "crash window never injected — policy never fired?")
    require(auto.compactionCount > 0, "policy never fired at sf1")
    require(maxFiles <= bound,
      s"file count $maxFiles exceeded bound $bound — compaction not keeping up")

    // hashes unchanged: distributed content digest, no driver collect
    // (bit_xor, not sum — summing 290k 64-bit hashes overflows ANSI add)
    def digest(inc: IncrementalLineDedup): (Long, Long) = {
      val r = inc.lines(spark)
      val row = r.withColumn("h", xxhash64(r.columns.map(col): _*))
        .agg(count(lit(1)), expr("bit_xor(h)")).head()
      (row.getLong(0), row.getLong(1))
    }
    val (ca, ha) = digest(auto)
    val (ct, ht) = digest(twin)
    println(s"PROBE auto_rows=$ca auto_hash=$ha twin_rows=$ct twin_hash=$ht")
    require(ca == ct && ha == ht,
      "compacted and never-compacted twins diverged — content moved")
    println("PROBE RESULT=PASS")
    spark.stop()
  }
}
