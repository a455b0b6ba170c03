package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.LlmText

/** The membership of one LSH band bucket: every doc_id that ever hashed
  * into this (band, key) — the value side of the state-store index. */
final case class BucketMembers(docs: Seq[Long])

/** A candidate near-dup pair emitted by the state function the moment
  * its LATER member lands in a shared band bucket — canonicalized
  * (doc_a < doc_b), so the global candidate set is the distinct fold of
  * the event stream. */
final case class CandPairEvent(doc_a: Long, doc_b: Long)

/** The banded-LSH candidate index on a REAL Spark state store (the
  * q119f doctrine applied to the flagship near-dup state): the (band,
  * key) → member-list index lives in RocksDB via
  * `flatMapGroupsWithState` instead of the parquet `bands/` dir of
  * [[IncrementalNearDup]], pinned to the SAME dedup-groups oracle as
  * batch q57 / streaming q66.
  *
  * Division of labor (the 100 TB shape): the store holds ONLY the
  * bucket membership — doc_ids per band key, RocksDB-backed so it
  * spills past memory and snapshots into the checkpoint — while the
  * shingle sets used for exact verification stay in the lake (the
  * session-cached `nearDupState` relation). Per-batch work is exactly
  * the batch's band rows: Spark shuffles them onto the state partitions
  * (hash of the bucket key) and the state function emits candidates
  * with POINT ACCESS per touched bucket — no committed-index scan, no
  * semi-join restriction step, nothing proportional to accumulated
  * state. This is the end state the parquet twin approximates in two
  * moves (broadcast semi-join to touched buckets + bucket-partitioned
  * file pruning); here the store's own hash partitioning IS the prune.
  *
  * Semantics mirror [[IncrementalNearDup]] exactly: candidates are
  * new-vs-(state ∪ new) within a bucket, each pair discovered once (in
  * the batch where its later member arrives; the same pair surfacing in
  * several of the 8 bands folds out in the consumer's distinct), and
  * the hot-bucket cap ([[LlmText.HotBucketCap]]) is applied to the
  * bucket's COMBINED membership per batch — a bucket over the cap stops
  * emitting new candidates while pairs found while it was small are
  * retained, the documented streaming-LSH tradeoff (including its
  * delete-side corollary) shared with the parquet twin. Membership
  * still accrues past the cap (a few longs per doc), so a bucket that
  * is hot for one batch and quiet after does not silently re-open.
  *
  * Retraction stays with the parquet twin: tombstone emission needs the
  * pair/band state readable OUTSIDE the stream (compaction, survivor
  * views), which the parquet layout provides and a state store hides —
  * the two twins are complementary, not interchangeable, and the entry
  * (`q66f`) is insert-only like q66.
  */
object StateStoreNearDup {

  /** Measured shape of one run: state rows = distinct touched (band,
    * key) buckets; bytes ≈ members × 8 + per-key overhead. The shingle
    * sets never enter the store. */
  final case class StateShape(stateRows: Long, stateBytes: Long,
      candEvents: Long)

  /** Fold of the state function for one bucket: append the arrivals not
    * already present; if the combined membership respects the hot cap,
    * emit each NEW member paired with every member that precedes it
    * (old ∪ earlier-in-batch) — each pair exactly once per bucket. */
  private def updateBucket(key: (Int, Long, Long),
      it: Iterator[(Int, Long, Long, Long)],
      state: GroupState[BucketMembers]): Iterator[CandPairEvent] = {
    val old = state.getOption.map(_.docs).getOrElse(Seq.empty)
    val seen = scala.collection.mutable.HashSet.from(old)
    val fresh = it.map(_._4).filter(seen.add(_)).toVector
    if (fresh.isEmpty) Iterator.empty
    else {
      val all = old ++ fresh
      state.update(BucketMembers(all))
      if (all.size > LlmText.HotBucketCap) Iterator.empty
      else fresh.iterator.zipWithIndex.flatMap { case (x, i) =>
        (old.iterator ++ fresh.iterator.take(i)).map(y =>
          CandPairEvent(math.min(x, y), math.max(x, y)))
      }
    }
  }

  /** The stateful candidate plan over a STREAMING (band, k0, k1,
    * doc_id) relation — the single flatMapGroupsWithState hop shared by
    * the MemoryStream wave driver ([[runWaves]]) and the continuous CDC
    * wire pipeline (qc8). The group-by key is the bucket; Spark's one
    * shuffle here lands each band row on its state partition. */
  def candidateEvents(bandRows: DataFrame): DataFrame =
    bandRows.select(col("band").cast("int").as("_1"),
        col("k0").cast("long").as("_2"), col("k1").cast("long").as("_3"),
        col("doc_id").cast("long").as("_4"))
      .as[(Int, Long, Long, Long)](Encoders.tuple(Encoders.scalaInt,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .groupByKey(t => (t._1, t._2, t._3))(Encoders.tuple(
        Encoders.scalaInt, Encoders.scalaLong, Encoders.scalaLong))
      .flatMapGroupsWithState[BucketMembers, CandPairEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateBucket)(
        Encoders.product[BucketMembers], Encoders.product[CandPairEvent])
      .toDF()

  /** Stream `waves` of band rows (band, k0, k1, doc_id — the flattened
    * [[LlmText.bandKeys]] output) through the bucket-state function on
    * the RocksDB provider; each wave is one micro-batch (drained before
    * the next is added), so cross-wave pair discovery exercises real
    * batch boundaries. Returns (accumulated candidate events, measured
    * state shape).
    *
    * `restartAfterWave = Some(i)` STOPS the streaming query after wave
    * `i` is drained and starts a fresh one on the SAME checkpoint — the
    * crash/redeploy recovery path: the RocksDB state snapshot is
    * restored from the checkpoint, the resumed query picks up at the
    * committed offset, and the drill spec pins the accumulated events
    * to the single-query run (a lost bucket state would re-emit pairs
    * already found — or miss cross-restart pairs — and fail the pin). */
  def runWaves(spark: SparkSession, waves: Seq[DataFrame],
      restartAfterWave: Option[Int] = None): (DataFrame, StateShape) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      StateStoreLineDedup.RocksDbProvider)
    val ckpt = java.nio.file.Files.createTempDirectory("q66f-ckpt").toString
    val rowEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong)
    val mem = MemoryStream[(Int, Long, Long, Long)](rowEnc, sqlCtx)
    val events = candidateEvents(mem.toDF()
      .select(col("_1").as("band"), col("_2").as("k0"),
        col("_3").as("k1"), col("_4").as("doc_id")))
    // normal runs use the memory sink (cheapest); a RESTART drill needs
    // a sink that supports checkpoint recovery, which the memory sink
    // does not — the parquet file sink does (and is the realistic
    // production sink: its _spark_metadata commit log keeps the batch
    // read below exactly-once even if a crash leaves orphan files)
    val fileMode = restartAfterWave.isDefined
    val evDir = if (fileMode)
      java.nio.file.Files.createTempDirectory("q66f-events").toString else ""
    val sinkName = "neardup_cand_events_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val evSchema = events.schema
    def start() =
      if (fileMode) events.writeStream.format("parquet")
        .option("path", evDir).outputMode("append")
        .option("checkpointLocation", ckpt).start()
      else events.writeStream.format("memory").queryName(sinkName)
        .outputMode("append").option("checkpointLocation", ckpt).start()
    def readEvents() =
      if (fileMode) spark.read.schema(evSchema).parquet(evDir)
      else spark.table(sinkName)
    var q = start()
    try {
      waves.zipWithIndex.foreach { case (w, i) =>
        mem.addData(w.collect().map(r =>
          (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq: _*)
        q.processAllAvailable()
        if (restartAfterWave.contains(i) && i < waves.size - 1) {
          q.stop()
          q = start()
        }
      }
      val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      val cands = readEvents().localCheckpoint(true)
      val shape = StateShape(
        stateRows = st.map(_.numRowsTotal).sum,
        stateBytes = st.map(_.memoryUsedBytes).sum,
        candEvents = cands.count())
      (cands, shape)
    } finally {
      q.stop()
      if (!fileMode) spark.catalog.dropTempView(sinkName)
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  /** Flatten [[LlmText.bandKeys]]'s (doc_id, band, key{k0,k1}) rows to
    * the wire tuple shape `runWaves` streams. */
  def flatBands(sig: DataFrame): DataFrame =
    LlmText.bandKeys(sig, 8, 2)
      .select(col("band"), col("key.k0").as("k0"), col("key.k1").as("k1"),
        col("doc_id"))
}
