package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.LlmText

/** The membership of one LSH band bucket: every doc_id that ever hashed
  * into this (band, bucket) — the value side of the state-store index. */
final case class BucketMembers(docs: Seq[Long])

/** A candidate near-dup pair emitted by the state function the moment
  * its LATER member lands in a shared band bucket — canonicalized
  * (doc_a < doc_b), so the global candidate set is the distinct fold of
  * the event stream. */
final case class CandPairEvent(doc_a: Long, doc_b: Long)

/** The banded-LSH candidate index on a REAL Spark state store (the
  * q119f doctrine applied to the flagship near-dup state): the (band,
  * bucket) → member-list index lives in RocksDB via
  * `flatMapGroupsWithState` instead of the parquet `bands/` dir of
  * [[IncrementalNearDup]], pinned to the SAME dedup-groups oracle as
  * batch q57 / streaming q66.
  *
  * BANDING IS A PARAMETER (VERDICT r11 item 1): the state key is
  * (band, bucket) where bucket = Spark's `xxhash64` over the band's
  * `bandR` consecutive minhash components ([[flatBands]] declaratively,
  * [[graft.functions.MinHashBands]] per-row on the continuous wire
  * plan) — hashing the key tuple to ONE long makes the key shape
  * design-independent, so the SAME store plumbing runs (8, 2), the
  * re-banded (4, 4), and the widened 32-component (8, 4) designs the
  * parquet twin migrates between (q66h/q66i). A 64-bit bucket
  * collision merges two buckets; the only effects are a spurious
  * candidate pair (killed by the downstream exact verify — results
  * unchanged) and the merged membership counting jointly toward the
  * hot cap (~2⁻⁶⁴ per bucket pair — documented, not load-bearing).
  * The store itself cannot migrate IN PLACE — bucket ids are opaque
  * hashes, so there is nothing to re-band from — which is exactly why
  * the production design-change move on this path is a REBUILD from
  * the lake replica through a fresh checkpoint (qc14), not an in-place
  * rewrite like the parquet twin's q66h/q66i.
  *
  * Division of labor (the 100 TB shape): the store holds ONLY the
  * bucket membership — doc_ids per band bucket, RocksDB-backed so it
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
  * several of the nBands bands folds out in the consumer's distinct),
  * and the hot-bucket cap ([[LlmText.HotBucketCap]]) is applied to the
  * bucket's COMBINED membership per batch — a bucket over the cap stops
  * emitting new candidates while pairs found while it was small are
  * retained, the documented streaming-LSH tradeoff (including its
  * delete-side corollary) shared with the parquet twin. Membership
  * still accrues past the cap (a few longs per doc), so a bucket that
  * is hot for one batch and quiet after does not silently re-open.
  *
  * Retraction: the insert-only form (`q66f`, [[candidateEvents]])
  * mirrors q66; the OP-stream form (`q66g`, [[opCandidateEvents]])
  * carries DELETEs through the store itself — the q119g doctrine on
  * this state, see the retraction section below.
  */
object StateStoreNearDup {

  /** Measured shape of one run: state rows = distinct touched (band,
    * bucket) pairs; bytes ≈ members × 8 + per-key overhead. The shingle
    * sets never enter the store. */
  final case class StateShape(stateRows: Long, stateBytes: Long,
      candEvents: Long)

  /** Fold of the state function for one bucket: append the arrivals not
    * already present; if the combined membership respects the hot cap,
    * emit each NEW member paired with every member that precedes it
    * (old ∪ earlier-in-batch) — each pair exactly once per bucket. */
  private def updateBucket(key: (Int, Long),
      it: Iterator[(Int, Long, Long)],
      state: GroupState[BucketMembers]): Iterator[CandPairEvent] = {
    val old = state.getOption.map(_.docs).getOrElse(Seq.empty)
    val seen = scala.collection.mutable.HashSet.from(old)
    val fresh = it.map(_._3).filter(seen.add(_)).toVector
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

  /** The stateful candidate plan over a STREAMING (band, bkey, doc_id)
    * relation — the single flatMapGroupsWithState hop shared by the
    * MemoryStream wave driver ([[runWaves]]) and the continuous CDC
    * wire pipeline (qc8). The group-by key is the bucket; Spark's one
    * shuffle here lands each band row on its state partition. */
  def candidateEvents(bandRows: DataFrame): DataFrame =
    bandRows.select(col("band").cast("int").as("_1"),
        col("bkey").cast("long").as("_2"), col("doc_id").cast("long").as("_3"))
      .as[(Int, Long, Long)](Encoders.tuple(Encoders.scalaInt,
        Encoders.scalaLong, Encoders.scalaLong))
      .groupByKey(t => (t._1, t._2))(Encoders.tuple(
        Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState[BucketMembers, CandPairEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateBucket)(
        Encoders.product[BucketMembers], Encoders.product[CandPairEvent])
      .toDF()

  /** Stream `waves` of band rows (band, bkey, doc_id — the flattened
    * [[flatBands]] output) through the bucket-state function on the
    * RocksDB provider; each wave is one micro-batch (drained before
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
    val ckpt = graft.util.Scratch.dir("q66f-ckpt")
    val rowEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong,
      Encoders.scalaLong)
    val mem = MemoryStream[(Int, Long, Long)](rowEnc, sqlCtx)
    val events = candidateEvents(mem.toDF()
      .select(col("_1").as("band"), col("_2").as("bkey"),
        col("_3").as("doc_id")))
    // normal runs use the memory sink (cheapest); a RESTART drill needs
    // a sink that supports checkpoint recovery, which the memory sink
    // does not — the parquet file sink does (and is the realistic
    // production sink: its _spark_metadata commit log keeps the batch
    // read below exactly-once even if a crash leaves orphan files)
    val fileMode = restartAfterWave.isDefined
    val evDir = if (fileMode)
      graft.util.Scratch.dir("q66f-events") else ""
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
          (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq: _*)
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

  /** Flatten [[LlmText.bandKeys]]'s (doc_id, band, key struct) rows to
    * the (band, bkey, doc_id) wire tuples [[runWaves]] streams, at any
    * banding design: bkey = `xxhash64` over the band's key components
    * (byte parity with the per-row native expression
    * [[graft.functions.MinHashBands]] is spec-pinned two-sided). `sig`
    * must carry h0..h{nBands·bandR−1} — the 16-component state for
    * (8, 2)/(4, 4), the 32-component family for (8, 4). */
  def flatBands(sig: DataFrame, nBands: Int = 8, bandR: Int = 2): DataFrame =
    LlmText.bandKeys(sig, nBands, bandR)
      .select(col("band"),
        xxhash64((0 until bandR).map(k => col(s"key.k$k")): _*).as("bkey"),
        col("doc_id"))

  // ---- DELETE retraction ON the state store (q66g — the q119g
  // doctrine applied to the near-dup state): the bucket value grows
  // from the member list to members + this bucket's tombstoned docs,
  // so a delete COOLS the bucket (members leave, hot-cap parity with
  // the parquet twin's tombstone-filtered probe view) and permanently
  // guards against replayed inserts. Routing is the elegant part: a
  // CDC DELETE carries the deleted row, so its band buckets are the
  // same pure function of its text as the insert's — the tombstone op
  // lands on exactly the doc's nBands buckets with point access, and
  // because every pair (a, b) was discovered in a bucket BOTH docs
  // share, a's buckets cover every bucket that ever emitted a pair
  // involving a.
  //
  // Design contrast with q119g: NO versioned events. Line ownership
  // needed per-key versions because a delete RAISES the owner
  // (non-monotone fold); here both folded sets are monotone — pair
  // events only accrue, tombstoned docs only die (re-insertion is a
  // new doc_id, the twins' shared contract) — so the consumer fold is
  // order-free: distinct pair events minus pairs touching a tombstoned
  // doc. The delete-side hot-cap caveat is shared with the parquet
  // twin: pairs suppressed while a bucket was over the cap are NOT
  // retro-generated when later deletes cool it — survivors-parity is
  // exact only while buckets stay under the cap for the whole stream.

  /** Per-bucket state for the retraction form: surviving members plus
    * the docs tombstoned in this bucket. */
  final case class BucketClaimState(docs: Seq[Long], dead: Seq[Long])

  /** A candidate-pair event (`tomb = false`, canonicalized doc_a <
    * doc_b) or a tombstone event (`tomb = true`, doc_a = the deleted
    * doc, doc_b = -1; one per bucket the doc's bands land in — the
    * consumer's distinct folds the copies). */
  final case class NearDupOpEvent(doc_a: Long, doc_b: Long, tomb: Boolean)

  /** Fold of the op state function for one bucket: deletes apply FIRST
    * (tombstones win within the batch — an insert+delete of one doc in
    * one batch nets to dead), then fresh inserts of non-dead docs pair
    * against the SURVIVING membership under the hot cap. */
  private def updateBucketOps(key: (Int, Long),
      it: Iterator[(Int, Long, Long, String)],
      state: GroupState[BucketClaimState]): Iterator[NearDupOpEvent] = {
    val st = state.getOption.getOrElse(BucketClaimState(Nil, Nil))
    val rows = it.toSeq
    val deadNow = rows.collect { case (_, _, d, "delete") => d }.toSet
    val newDead = (deadNow -- st.dead).toSeq.sorted
    val dead = st.dead.toSet ++ deadNow
    // dead members leave the membership physically: they must never
    // pair again, and their departure cools an over-cap bucket exactly
    // as the parquet twin's tombstone-filtered band view does
    val kept = st.docs.filterNot(dead)
    val seen = scala.collection.mutable.HashSet.from(kept)
    val fresh = rows.collect {
      case (_, _, d, "insert") if !dead(d) => d
    }.filter(seen.add(_)).toVector
    if (fresh.isEmpty && newDead.isEmpty) Iterator.empty
    else {
      val alive = kept ++ fresh
      state.update(BucketClaimState(alive, st.dead ++ newDead))
      val tombEv = newDead.iterator.map(d =>
        NearDupOpEvent(d, -1L, tomb = true))
      // hot cap over the SURVIVING membership; pairs suppressed while
      // the bucket was hot stay missing (documented caveat above)
      val pairEv =
        if (alive.size > LlmText.HotBucketCap) Iterator.empty
        else fresh.iterator.zipWithIndex.flatMap { case (x, i) =>
          (kept.iterator ++ fresh.iterator.take(i)).map(y =>
            NearDupOpEvent(math.min(x, y), math.max(x, y), tomb = false))
        }
      tombEv ++ pairEv
    }
  }

  /** The stateful op plan over a STREAMING (band, bkey, doc_id, op)
    * relation — insert and delete band rows on one key; the single
    * flatMapGroupsWithState hop, one shuffle onto the state
    * partitions, same as [[candidateEvents]]. */
  def opCandidateEvents(opBandRows: DataFrame): DataFrame =
    opBandRows.select(col("band").cast("int").as("_1"),
        col("bkey").cast("long").as("_2"),
        col("doc_id").cast("long").as("_3"), col("op").as("_4"))
      .as[(Int, Long, Long, String)](Encoders.tuple(Encoders.scalaInt,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING))
      .groupByKey(t => (t._1, t._2))(Encoders.tuple(
        Encoders.scalaInt, Encoders.scalaLong))
      .flatMapGroupsWithState[BucketClaimState, NearDupOpEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateBucketOps)(
        Encoders.product[BucketClaimState], Encoders.product[NearDupOpEvent])
      .toDF()

  /** Fold the op-event stream to the surviving candidate pairs:
    * distinct pair events minus any pair touching a tombstoned doc.
    * Order-free (both sets are monotone — see the section doc), so no
    * event versioning is needed, unlike [[StateStoreLineDedup
    * .foldVersionedOwners]]. */
  def foldOpEvents(events: DataFrame): DataFrame = {
    val tombs = events.where(col("tomb")).select(col("doc_a")).distinct()
    events.where(!col("tomb")).select(col("doc_a"), col("doc_b")).distinct()
      .join(tombs, Seq("doc_a"), "left_anti")
      .join(tombs.withColumnRenamed("doc_a", "doc_b"), Seq("doc_b"),
        "left_anti")
      .select(col("doc_a"), col("doc_b")) // anti-join reorders join keys
  }

  /** Stream `waves` of (band, bkey, doc_id, op) rows through the
    * claimant bucket state on the RocksDB provider; same drain/restart
    * contract as [[runWaves]]. Returns the RAW op-event relation
    * (callers fold with [[foldOpEvents]]) plus the measured shape. */
  def runOpWaves(spark: SparkSession, waves: Seq[DataFrame],
      restartAfterWave: Option[Int] = None): (DataFrame, StateShape) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      StateStoreLineDedup.RocksDbProvider)
    val ckpt = graft.util.Scratch.dir("q66g-ckpt")
    val rowEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.STRING)
    val mem = MemoryStream[(Int, Long, Long, String)](rowEnc, sqlCtx)
    val events = opCandidateEvents(mem.toDF()
      .select(col("_1").as("band"), col("_2").as("bkey"),
        col("_3").as("doc_id"), col("_4").as("op")))
    val fileMode = restartAfterWave.isDefined
    val evDir = if (fileMode)
      graft.util.Scratch.dir("q66g-events") else ""
    val sinkName = "neardup_op_events_" +
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
        mem.addData(w.select(col("band"), col("bkey"),
            col("doc_id"), col("op")).collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
            r.getString(3))).toSeq: _*)
        q.processAllAvailable()
        if (restartAfterWave.contains(i) && i < waves.size - 1) {
          q.stop()
          q = start()
        }
      }
      val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      val all = readEvents().localCheckpoint(true)
      val shape = StateShape(
        stateRows = st.map(_.numRowsTotal).sum,
        stateBytes = st.map(_.memoryUsedBytes).sum,
        candEvents = all.count())
      (all, shape)
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
}
