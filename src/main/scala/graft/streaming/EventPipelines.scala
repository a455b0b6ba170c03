package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session accumulator for [[EventPipelines.sessionsViaState]]
  * (epoch millis; kept flat for a cheap product encoder). */
final case class SessionAcc(startMs: Long, endMs: Long, n: Long)

/** Closed session emitted by [[EventPipelines.sessionsViaState]]. */
final case class SessionOut(user_id: Long, session_start: Timestamp,
    events: Long, session_sec: Double)

/** Funnel state for [[EventPipelines.funnelViaState]]: first qualifying
  * entry time per stage (epoch ms, 0 = not reached) plus the
  * not-yet-releasable event buffer (events newer than the watermark,
  * kept so late arrivals are folded in event-time order). */
final case class FunnelAcc(t1Ms: Long, t2Ms: Long, t3Ms: Long,
    pending: Seq[(Long, String)])

/** A funnel stage reached by a user (1 = view, 2 = click-within-24h,
  * 3 = purchase-within-24h), emitted by
  * [[EventPipelines.funnelViaState]]. */
final case class FunnelStage(user_id: Long, stage: Int, reached: Timestamp)

/** Streaming twins of the batch window queries Q37–Q40 (SURVEY.md §2C):
  * the same logical transforms over an unbounded `events`-shaped stream
  * (`ts timestamp, event_id long, user_id long, event_type string,
  * value double`), with watermarks bounding state.
  *
  * Batch/stream equivalence is asserted in EventPipelinesSpec: run the
  * stream from a MemoryStream of the fixture rows, compare with the
  * batch query on the same rows.
  *
  * 100 TB design: every operator below keys its state (window ×
  * event_type, user_id, …) so the state store partitions horizontally;
  * watermark TTL keeps per-key state bounded regardless of stream
  * length.
  */
object EventPipelines {

  /** Q37 streaming: tumbling 1h counts/sums per event_type. */
  def tumbling(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("cnt"), col("sum_value"))

  /** Q38 streaming: sliding 1h/30min counts. */
  def sliding(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("cnt"))

  /** Q39 streaming: 30-min-gap session windows per user. */
  def sessions(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("events"),
        (max(col("ts")).cast("double") - min(col("ts")).cast("double")).as("session_sec"))
      .select(col("user_id"), col("w.start").as("session_start"), col("events"), col("session_sec"))

  /** Q40 streaming: keyed dedup, watermark-bounded state. */
  def dedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("user_id", "event_type")

  /** Q39 via explicit state (the `flatMapGroupsWithState` +
    * `EventTimeTimeout` form of 30-min-gap sessionization): one open
    * session per user in the state store; events within `gapMinutes` of
    * the session end extend it, a later event closes-and-emits it, and
    * the event-time timeout (watermark passing session end + gap)
    * flushes sessions no further event will ever extend. Demonstrates
    * custom keyed state with timeouts — the machinery `session_window`
    * hides — for session logic the built-in can't express (e.g.
    * per-session running payloads). Same gap semantics as the q39
    * gaps-and-islands oracle: a new session starts strictly beyond the
    * gap. State is one 24-byte accumulator per live user, watermark-
    * bounded — the 100 TB shape.
    */
  def sessionsViaState(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "2 hours"): DataFrame = {
    val gapMs = gapMinutes * 60000L
    def emit(user: Long, s: SessionAcc): SessionOut =
      SessionOut(user, new Timestamp(s.startMs), s.n, (s.endMs - s.startMs) / 1000.0)
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)](Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, it: Iterator[(Long, Timestamp)], state: GroupState[SessionAcc]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(user, s))
          } else {
            val times = it.map(_._2.getTime).toVector.sorted
            var closed = Vector.empty[SessionOut]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  cur = Some(SessionAcc(s.startMs, math.max(s.endMs, t), s.n + 1))
                case Some(s) =>
                  closed :+= emit(user, s)
                  cur = Some(SessionAcc(t, t, 1))
                case None =>
                  cur = Some(SessionAcc(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout must sit beyond the current watermark
              state.setTimeoutTimestamp(
                math.max(s.endMs + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.iterator
          }
        })(Encoders.product[SessionAcc], Encoders.product[SessionOut])
      .toDF()
  }

  /** Q82 streaming: the ordered view → click → purchase funnel as a
    * per-user state machine (`flatMapGroupsWithState` +
    * `EventTimeTimeout`). Semantics are EXACTLY the batch q82: stage 1
    * is the user's first view; stage n>1 is the first qualifying event
    * STRICTLY after the previous stage's entry and within
    * `horizonHours` of it.
    *
    * Out-of-order arrival is handled the principled way: events are
    * BUFFERED in state until the watermark passes their event time,
    * then released in event-time order into the FSM — so a late view
    * that precedes an already-buffered click still wins stage 1, and
    * the stream result equals the batch result on any arrival order the
    * watermark admits (pinned in EventPipelinesSpec). An event later
    * than its watermark is dropped by Spark before reaching the FSM —
    * the standard contract.
    *
    * 100 TB shape: state per user is three longs plus only the events
    * inside the lateness window (watermark-bounded, NOT stream-length-
    * bounded); the FSM emits each stage once, so output is ≤ 3 rows per
    * user. Timeouts flush users whose buffered events all age past the
    * watermark with no new arrivals.
    *
    * State lifecycle: a TERMINAL funnel (completed, or its conversion
    * horizon expired) collapses to a 4-long TOMBSTONE that swallows the
    * user's later events — removing the entry outright would let a
    * later view RE-ENTER stage 1 and re-emit rows batch q82 emits only
    * once (a state machine with no memory of termination restarts).
    * The tombstone self-removes once the watermark passes a deadline
    * FIXED at termination (wm_at_termination + `tombstoneTtlHours`,
    * recorded in the state itself) — arrivals never extend it, so even
    * a user with steady post-conversion traffic releases on schedule.
    * The standard state-TTL trade: exact batch parity inside the TTL
    * window, bounded keyed state (active funnels + tombstones within
    * TTL of termination) on an unbounded stream. */
  def funnelViaState(events: DataFrame, horizonHours: Int = 24,
      watermark: String = "1 hour", tombstoneTtlHours: Int = 168): DataFrame = {
    val hMs = horizonHours * 3600000L
    val ttlMs = tombstoneTtlHours * 3600000L
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, Timestamp, String)](Encoders.tuple(
        Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.STRING))
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelAcc, FunnelStage](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, it: Iterator[(Long, Timestamp, String)],
            state: GroupState[FunnelAcc]) => {
          val acc = state.getOption.getOrElse(FunnelAcc(0L, 0L, 0L, Nil))
          val wm = state.getCurrentWatermarkMs
          if (acc.t1Ms == -1L) {
            // tombstone: the funnel terminated — swallow arrivals so a
            // later view can't restart stage 1; release on TTL timeout.
            // The deadline was FIXED at termination (stored in t2Ms):
            // Spark clears a group's timeout on every invocation, so
            // re-arm with the stored deadline, NOT wm+ttl — re-arming
            // from the current watermark would let a user with steady
            // post-conversion traffic hold their tombstone forever
            // (state bounded by trafficked users, not by the TTL). The
            // max(…, wm+1) guard covers the same-trigger race where
            // data arrives after the watermark already passed the
            // deadline (a timeout timestamp must exceed the watermark);
            // it extends the tombstone by at most one trigger.
            it.foreach(_ => ())
            if (state.hasTimedOut) state.remove()
            else state.setTimeoutTimestamp(math.max(acc.t2Ms, wm + 1))
            Iterator.empty
          } else {
          val all = acc.pending ++ it.map(e => (e._2.getTime, e._3))
          val (ripe, hold) = all.partition(_._1 <= wm)
          var (t1, t2, t3) = (acc.t1Ms, acc.t2Ms, acc.t3Ms)
          var out = Vector.empty[FunnelStage]
          ripe.sortBy(_._1).foreach { case (t, tp) =>
            if (tp == "view" && t1 == 0L) {
              t1 = t; out :+= FunnelStage(user, 1, new Timestamp(t))
            } else if (tp == "click" && t1 != 0L && t2 == 0L && t > t1 && t <= t1 + hMs) {
              t2 = t; out :+= FunnelStage(user, 2, new Timestamp(t))
            } else if (tp == "purchase" && t2 != 0L && t3 == 0L && t > t2 && t <= t2 + hMs) {
              t3 = t; out :+= FunnelStage(user, 3, new Timestamp(t))
            }
          }
          // with no held events, the funnel can never ADVANCE once
          // (a) it completed, (b) the conversion horizon for the next
          // stage has passed the watermark (any future arrival has
          // event time > watermark — Spark drops later-late rows before
          // the stateful operator), or (c) no stage was ever entered
          // (all-zero state ≡ the fresh-user default, so dropping it is
          // a no-op semantically). Case (c) removes outright; (a)/(b)
          // must NOT — a fresh state would let a later view re-enter
          // stage 1 — so they collapse to the TTL'd tombstone instead.
          val terminal = hold.isEmpty && (
            t3 != 0L ||
            (t2 != 0L && wm >= t2 + hMs) ||
            (t1 != 0L && t2 == 0L && wm >= t1 + hMs) ||
            t1 == 0L)
          if (terminal) {
            if (t1 == 0L) { if (state.exists) state.remove() }
            else {
              // tombstone with its release deadline recorded in t2Ms:
              // TTL is measured from TERMINATION, immutable thereafter
              state.update(FunnelAcc(-1L, wm + ttlMs, 0L, Nil))
              state.setTimeoutTimestamp(wm + ttlMs)
            }
          } else {
            state.update(FunnelAcc(t1, t2, t3, hold))
            if (hold.nonEmpty)
              // wake when the watermark can release the oldest held event
              state.setTimeoutTimestamp(math.max(hold.map(_._1).min, wm + 1))
            else if (t2 != 0L)
              // mid-funnel, nothing buffered: wake when the purchase
              // horizon closes so the entry collapses to its tombstone
              // (> wm here, else `terminal` would have fired)
              state.setTimeoutTimestamp(t2 + hMs)
            else
              state.setTimeoutTimestamp(t1 + hMs) // click horizon
          }
          out.iterator
          }
        })(Encoders.product[FunnelAcc], Encoders.product[FunnelStage])
      .toDF()
  }

  /** Stream-stream interval join: each purchase attributed to the same
    * user's signups within the preceding `horizon` — the streaming
    * sibling of the batch as-of join (Q12). Both sides carry watermarks
    * and the join condition is time-bounded, so state for either side
    * is dropped once the watermark passes the interval: state size is
    * O(events within horizon), independent of stream length.
    */
  def purchaseAttribution(purchases: DataFrame, signups: DataFrame,
      watermark: String = "1 hour", horizon: String = "24 hours",
      joinType: String = "inner"): DataFrame = {
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val sg = signups.withWatermark("ts", watermark)
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
    p.join(sg,
      col("user_id") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("purchase_id"), col("user_id"), col("signup_id"), col("p_ts"), col("s_ts"))
  }
}
