package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** JVM-wide probe for the CdcForeach test (local mode = one JVM). */
object CdcForeachProbe {
  val seen = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
  val failed = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
}

/** Batch/stream equivalence for the windowed operators (SURVEY.md §5.2
  * item 4): the streaming pipelines over a MemoryStream of fixture-shaped
  * rows must agree with the batch queries on the same rows.
  */
class EventPipelinesSpec extends AnyFunSuite with SparkTestSession {

  private def t(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    Ev(1, t("2024-01-01 00:05:00"), 1, "view", 1.0),
    Ev(2, t("2024-01-01 00:20:00"), 1, "view", 2.0),
    Ev(3, t("2024-01-01 00:55:00"), 2, "click", 3.0),
    Ev(4, t("2024-01-01 01:10:00"), 1, "view", 4.0),
    Ev(5, t("2024-01-01 02:30:00"), 2, "click", 5.0),
    Ev(6, t("2024-01-01 05:00:00"), 1, "view", 6.0)) // advances watermark

  test("streaming tumbling window agrees with batch date_trunc groupBy") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.tumbling(mem.toDF())
      .writeStream.format("memory").queryName("tumbling_s")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_s")
        .select(col("hour_start").cast("string"), col("event_type"), col("cnt"), col("sum_value"))
        .collect().map(_.toSeq).toSet
      val batch = rows.toDF()
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("hour_start").cast("string"), col("event_type"), col("cnt"), col("sum_value"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup keeps one row per (user_id, event_type)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.dedup(mem.toDF())
      .writeStream.format("memory").queryName("dedup_s")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("dedup_s").select("user_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "view"), (2L, "click")))
      assert(spark.table("dedup_s").count() == 2)
    } finally q.stop()
  }

  test("streaming session windows close after the gap + watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.sessions(mem.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("sessions_s")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(5): _*)
      q.processAllAvailable()
      mem.addData(rows.last) // 05:00 event pushes watermark past earlier sessions
      q.processAllAvailable()
      // watermark advances one batch behind the data: a further event is
      // needed before the 02:30 session (closes 03:00) is emitted
      mem.addData(Ev(7, t("2024-01-01 08:00:00"), 1, "view", 7.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_s")
        .select(col("user_id"), col("session_start").cast("string"), col("events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // user 1: (00:05,00:20) then (01:10); user 2: (00:55) then (02:30)
      assert(sessions.contains((1L, "2024-01-01 00:05:00", 2L)))
      assert(sessions.contains((1L, "2024-01-01 01:10:00", 1L)))
      assert(sessions.count(_._1 == 2L) == 2)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization agrees with the gaps-and-islands semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.sessionsViaState(mem.toDF(), gapMinutes = 30, watermark = "1 hour")
      .writeStream.format("memory").queryName("sessions_fmgws")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(5): _*)
      q.processAllAvailable()
      mem.addData(rows.last) // 05:00 advances the watermark
      q.processAllAvailable()
      mem.addData(Ev(7, t("2024-01-01 08:00:00"), 1, "view", 7.0))
      q.processAllAvailable()
      mem.addData(Ev(8, t("2024-01-01 12:00:00"), 2, "view", 8.0))
      q.processAllAvailable() // timeout pass flushes sessions ended before the watermark
      val sessions = spark.table("sessions_fmgws")
        .select(col("user_id"), col("session_start").cast("string"),
          col("events"), col("session_sec"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      // same islands as the session_window test: user 1 (00:05+00:20),
      // (01:10), (05:00); user 2 (00:55), (02:30)
      assert(sessions.contains((1L, "2024-01-01 00:05:00", 2L, 900.0)), sessions.toString)
      assert(sessions.contains((1L, "2024-01-01 01:10:00", 1L, 0.0)))
      assert(sessions.contains((1L, "2024-01-01 05:00:00", 1L, 0.0)))
      assert(sessions.count(_._1 == 2L) == 2)
    } finally q.stop()
  }

  test("late events beyond the watermark are dropped from append output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.tumbling(mem.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("late_s")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(5): _*) // through 02:30
      q.processAllAvailable()
      // watermark is now 02:00; this event's 00:00 window is closed
      mem.addData(Ev(99, t("2024-01-01 00:59:00"), 9, "late", 100.0))
      q.processAllAvailable()
      mem.addData(rows.last) // 05:00 → flush windows up to 04:30
      q.processAllAvailable()
      mem.addData(Ev(100, t("2024-01-01 07:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val types = spark.table("late_s").select("event_type")
        .collect().map(_.getString(0)).toSet
      assert(!types.contains("late"), s"late event leaked: $types")
    } finally q.stop()
  }

  test("CdcForeach isolates per-event failures like the reference's recover()") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // ForeachWriter closures are serialized to tasks even in local mode:
    // collect through a JVM-singleton probe, not captured locals
    CdcForeachProbe.seen.clear(); CdcForeachProbe.failed.clear()
    val sink = new CdcForeach(
      row => {
        val id = row.getAs[Long]("event_id")
        if (id == 3) throw new RuntimeException("boom")
        CdcForeachProbe.seen.add(id); ()
      },
      (row, _) => { CdcForeachProbe.failed.add(row.getAs[Long]("event_id")); () })
    val q = mem.toDF().writeStream.foreach(sink).start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      assert(CdcForeachProbe.failed.size == 1 && CdcForeachProbe.failed.get(0) == 3L)
      assert(CdcForeachProbe.seen.size == rows.length - 1)
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to recent signups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val signups = MemoryStream[Ev]
    val q = EventPipelines.purchaseAttribution(
        purchases.toDF(), signups.toDF(), watermark = "1 hour", horizon = "2 hours")
      .writeStream.format("memory").queryName("attrib_s")
      .outputMode("append").start()
    try {
      signups.addData(
        Ev(10, t("2024-01-01 00:00:00"), 1, "signup", 0.0),
        Ev(11, t("2024-01-01 03:00:00"), 2, "signup", 0.0))
      purchases.addData(
        Ev(20, t("2024-01-01 01:00:00"), 1, "purchase", 5.0), // 1h after signup 10 ✓
        Ev(21, t("2024-01-01 03:30:00"), 1, "purchase", 5.0), // 3.5h after → outside horizon
        Ev(22, t("2024-01-01 04:00:00"), 2, "purchase", 5.0)) // 1h after signup 11 ✓
      q.processAllAvailable()
      // advance both watermarks so joined results finalize
      signups.addData(Ev(12, t("2024-01-01 09:00:00"), 3, "signup", 0.0))
      purchases.addData(Ev(23, t("2024-01-01 09:00:00"), 3, "purchase", 1.0))
      q.processAllAvailable()
      val pairs = spark.table("attrib_s")
        .select("purchase_id", "signup_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((20L, 10L)))
      assert(pairs.contains((22L, 11L)))
      assert(!pairs.exists(_._1 == 21L), s"purchase 21 outside horizon: $pairs")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched purchases with null signup") {
    // the q71 batch shape in streaming form: a purchase with no signup
    // in its horizon must still be emitted (signup_id NULL) — but only
    // after BOTH watermarks pass the interval, proving the state that
    // held the purchase open was dropped rather than leaked
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val signups = MemoryStream[Ev]
    val q = EventPipelines.purchaseAttribution(
        purchases.toDF(), signups.toDF(), watermark = "1 hour",
        horizon = "2 hours", joinType = "left_outer")
      .writeStream.format("memory").queryName("attrib_lo")
      .outputMode("append").start()
    try {
      signups.addData(
        Ev(10, t("2024-01-01 00:00:00"), 1, "signup", 0.0),
        Ev(11, t("2024-01-01 03:00:00"), 2, "signup", 0.0))
      purchases.addData(
        Ev(20, t("2024-01-01 01:00:00"), 1, "purchase", 5.0), // matched
        Ev(21, t("2024-01-01 03:30:00"), 1, "purchase", 5.0), // no signup in horizon
        Ev(22, t("2024-01-01 04:00:00"), 2, "purchase", 5.0)) // matched
      q.processAllAvailable()
      // far-future rows push both watermarks beyond every open interval
      signups.addData(Ev(12, t("2024-01-02 00:00:00"), 3, "signup", 0.0))
      purchases.addData(Ev(23, t("2024-01-02 00:00:00"), 3, "purchase", 1.0))
      q.processAllAvailable()
      val got = spark.table("attrib_lo")
        .select(col("purchase_id"), col("signup_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(got.contains((20L, Some(10L))))
      assert(got.contains((22L, Some(11L))))
      assert(got.contains((21L, None)), s"unmatched purchase 21 never emitted: $got")
      // and the streaming result agrees with the batch left-outer join
      // on the same rows (the q71 shape)
      val evs = Seq(
        Ev(10, t("2024-01-01 00:00:00"), 1, "signup", 0.0),
        Ev(11, t("2024-01-01 03:00:00"), 2, "signup", 0.0),
        Ev(12, t("2024-01-02 00:00:00"), 3, "signup", 0.0),
        Ev(20, t("2024-01-01 01:00:00"), 1, "purchase", 5.0),
        Ev(21, t("2024-01-01 03:30:00"), 1, "purchase", 5.0),
        Ev(22, t("2024-01-01 04:00:00"), 2, "purchase", 5.0),
        Ev(23, t("2024-01-02 00:00:00"), 3, "purchase", 1.0)).toDF()
      val p = evs.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      val sg = evs.where(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
      val batch = p.join(sg,
          col("user_id") === col("s_user") && col("s_ts") <= col("p_ts") &&
            col("s_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS"), "left")
        .select(col("purchase_id"), col("signup_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(got == batch, s"stream $got != batch $batch")
    } finally q.stop()
  }

  test("funnel FSM matches batch q82 semantics, including out-of-order arrival") {
    // the q82 streaming twin: stage entries must follow the chained
    // strictly-after + within-horizon rule, and a LATE view delivered a
    // batch after the click it precedes in event time must still win
    // stage 1 (the watermark buffer re-orders before the FSM consumes)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.funnelViaState(mem.toDF(), horizonHours = 24,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("funnel_fmgws")
      .outputMode("append").start()
    try {
      // batch 1: u1's click arrives FIRST; u2 full in-order funnel;
      // u3 click-before-view then nothing qualifying after
      mem.addData(
        Ev(20, t("2024-01-01 01:40:00"), 1, "click", 0.0),
        Ev(30, t("2024-01-01 01:00:00"), 2, "view", 0.0),
        Ev(31, t("2024-01-01 01:30:00"), 2, "click", 0.0),
        Ev(32, t("2024-01-01 02:00:00"), 2, "purchase", 0.0),
        Ev(40, t("2024-01-01 01:00:00"), 3, "click", 0.0),
        Ev(41, t("2024-01-01 01:30:00"), 3, "view", 0.0))
      q.processAllAvailable() // watermark after this batch: 02:00 - 1h = 01:00
      // batch 2: u1's view, event time 01:10 — later than the watermark,
      // earlier than the already-buffered click
      mem.addData(Ev(21, t("2024-01-01 01:10:00"), 1, "view", 0.0))
      q.processAllAvailable()
      // two far-future batches: first advances the watermark past all
      // buffered events, second lets the release/timeout pass run
      mem.addData(Ev(90, t("2024-01-03 00:00:00"), 99, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Ev(91, t("2024-01-04 00:00:00"), 99, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("funnel_fmgws")
        .select(col("user_id"), col("stage"), col("reached").cast("string"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(got.contains((1L, 1, "2024-01-01 01:10:00")), got.toString)
      assert(got.contains((1L, 2, "2024-01-01 01:40:00")),
        s"late view must precede the buffered click: $got")
      assert(got.contains((2L, 1, "2024-01-01 01:00:00")))
      assert(got.contains((2L, 2, "2024-01-01 01:30:00")))
      assert(got.contains((2L, 3, "2024-01-01 02:00:00")))
      // u3: the click at 01:00 precedes the first view — stage 1 only
      assert(got.contains((3L, 1, "2024-01-01 01:30:00")))
      assert(!got.exists(g => g._1 == 3L && g._2 >= 2), s"u3 must stall at stage 1: $got")
    } finally q.stop()
  }

  test("a terminal funnel never re-emits: later views hit the tombstone") {
    // completing the funnel must terminate the user's FSM permanently
    // (within the tombstone TTL): a later view re-entering stage 1 and
    // re-emitting rows is exactly what batch q82 never does
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventPipelines.funnelViaState(mem.toDF(), horizonHours = 24,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("funnel_tomb")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(50, t("2024-01-01 01:00:00"), 5, "view", 0.0),
        Ev(51, t("2024-01-01 01:30:00"), 5, "click", 0.0),
        Ev(52, t("2024-01-01 02:00:00"), 5, "purchase", 0.0))
      q.processAllAvailable()
      // advance the watermark far past the purchase so the funnel goes
      // terminal (tombstone), then send a fresh view for the SAME user
      // and advance again so it would be released into the FSM
      mem.addData(Ev(90, t("2024-01-03 00:00:00"), 99, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Ev(53, t("2024-01-03 01:00:00"), 5, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Ev(91, t("2024-01-05 00:00:00"), 99, "view", 0.0))
      q.processAllAvailable()
      val u5 = spark.table("funnel_tomb")
        .where(col("user_id") === 5).collect()
        .map(r => (r.getInt(1), r.getTimestamp(2).toString)).toSet
      assert(u5 == Set((1, "2024-01-01 01:00:00.0"), (2, "2024-01-01 01:30:00.0"),
        (3, "2024-01-01 02:00:00.0")),
        s"terminal funnel re-emitted after a later view: $u5")
    } finally q.stop()
  }

  test("full-outer stream-stream join emits unmatched rows from BOTH sides") {
    // the q71b batch shape in streaming form: a purchase with no signup
    // arrives with NULL signup_id AND a signup that attributed nothing
    // arrives with NULL purchase_id, each finalized only after both
    // watermarks pass its interval
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val signups = MemoryStream[Ev]
    val q = EventPipelines.purchaseAttribution(
        purchases.toDF(), signups.toDF(), watermark = "1 hour",
        horizon = "2 hours", joinType = "full_outer")
      .writeStream.format("memory").queryName("attrib_fo")
      .outputMode("append").start()
    try {
      signups.addData(
        Ev(10, t("2024-01-01 00:00:00"), 1, "signup", 0.0), // matched by 20
        Ev(11, t("2024-01-01 03:00:00"), 2, "signup", 0.0)) // converts nothing
      purchases.addData(
        Ev(20, t("2024-01-01 01:00:00"), 1, "purchase", 5.0), // matched
        Ev(21, t("2024-01-01 06:00:00"), 1, "purchase", 5.0)) // no signup in horizon
      q.processAllAvailable()
      signups.addData(Ev(12, t("2024-01-02 00:00:00"), 3, "signup", 0.0))
      purchases.addData(Ev(23, t("2024-01-02 00:00:00"), 3, "purchase", 1.0))
      q.processAllAvailable()
      val got = spark.table("attrib_fo")
        .select(col("purchase_id"), col("signup_id")).collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(got.contains((Some(20L), Some(10L))))
      assert(got.contains((Some(21L), None)), s"unmatched purchase 21 never emitted: $got")
      assert(got.contains((None, Some(11L))), s"unmatched signup 11 never emitted: $got")
    } finally q.stop()
  }

  test("dedup runs on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Ev]
    val q = EventPipelines.dedup(mem.toDF())
      .writeStream.format("memory").queryName("dedup_rocks")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      assert(spark.table("dedup_rocks").count() == 2)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stats listener reports per-batch throughput like the reference ticker") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    var seen = Vector.empty[StatsListener.Stats]
    val listener = new StatsListener(s => seen :+= s)
    spark.streams.addListener(listener)
    val mem = MemoryStream[Ev]
    val q = mem.toDF().writeStream.format("memory").queryName("stats_s").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen.exists(_.numberOfEvents == rows.length))
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
