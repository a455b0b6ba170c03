package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window operators in their batch form (SURVEY.md §2C Q37–Q40);
  * the streaming twins (watermarks, `session_window`, streaming
  * `dropDuplicates`) live in [[graft.streaming.EventPipelines]] and are
  * equivalence-tested against these in ScalaTest.
  *
  * Reference analog: the stats ticker (`gomaxscale.go:120-135`,
  * `types.go:200-213`) is a 1-period tumbling count — Q37 generalizes it.
  */
object Windowed {

  private val Fmt = "yyyy-MM-dd HH:mm:ss"

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q37_tumbling_window",
      (s, d) => Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select(date_format(col("w.start"), Fmt).as("hour_start"), col("event_type"),
          col("cnt"), col("sum_value"))
        .orderBy(col("hour_start"), col("event_type")),
      Some("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, " +
        "event_type, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type")),

    QueryDef("q38_sliding_window",
      // Spark's sliding windows are epoch-aligned; the oracle reproduces
      // them by assigning each event to its two covering 30-min starts.
      (s, d) => Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("w.start"), Fmt).as("window_start"), col("cnt"))
        .orderBy(col("window_start")),
      Some("SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, COUNT(*) AS cnt FROM (" +
        "SELECT make_timestamp(CAST(floor(epoch(ts)/1800.0) AS BIGINT)*1800000000 - k*1800000000) AS ws " +
        "FROM events CROSS JOIN (VALUES (0),(1)) t(k)) GROUP BY ws ORDER BY window_start")),

    QueryDef("q39_session_window",
      // Gaps-and-islands: a gap > 30 min opens a new session. Single
      // shuffle on user_id; at 100 TB this is the RocksDB session-window
      // state path in streaming mode.
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, d, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              (col("ts").cast("double") - col("prev_ts").cast("double")) > 1800.0, 1).otherwise(0))
          .withColumn("sess_id", sum(col("new_sess")).over(run))
          .groupBy(col("user_id"), col("sess_id"))
          .agg((max(col("ts")).cast("double") - min(col("ts")).cast("double")).as("sess_len"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("session_count"), round(avg(col("sess_len")), 2).as("avg_session_sec"))
          .orderBy(col("user_id"))
      },
      Some("WITH o AS (SELECT user_id, ts, event_id, " +
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
        "f AS (SELECT user_id, ts, event_id, CASE WHEN prev_ts IS NULL OR " +
        "epoch(ts) - epoch(prev_ts) > 1800.0 THEN 1 ELSE 0 END AS new_sess FROM o), " +
        "s AS (SELECT user_id, ts, SUM(new_sess) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id FROM f), " +
        "g AS (SELECT user_id, sess_id, epoch(MAX(ts)) - epoch(MIN(ts)) AS sess_len " +
        "FROM s GROUP BY user_id, sess_id) " +
        "SELECT user_id, COUNT(*) AS session_count, ROUND(AVG(sess_len), 2) AS avg_session_sec " +
        "FROM g GROUP BY user_id ORDER BY user_id")),

    QueryDef("q39b_session_native",
      // Spark's native session_window in BATCH mode, hash-checked
      // against the same gaps-and-islands oracle as q39 — validates the
      // session operator's semantics, not just our manual rewrite.
      // Boundary note (SURVEY.md §7.3): session_window opens a new
      // session at gap >= 30 min, the islands SQL at gap > 30 min; the
      // fixture has zero exact-1800s gaps (verified), so they agree.
      (s, d) => Tables(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg((max(col("ts")).cast("double") - min(col("ts")).cast("double")).as("sess_len"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("session_count"), round(avg(col("sess_len")), 2).as("avg_session_sec"))
        .orderBy(col("user_id")),
      Some("WITH o AS (SELECT user_id, ts, event_id, " +
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events), " +
        "f AS (SELECT user_id, ts, event_id, CASE WHEN prev_ts IS NULL OR " +
        "epoch(ts) - epoch(prev_ts) > 1800.0 THEN 1 ELSE 0 END AS new_sess FROM o), " +
        "s AS (SELECT user_id, ts, SUM(new_sess) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id FROM f), " +
        "g AS (SELECT user_id, sess_id, epoch(MAX(ts)) - epoch(MIN(ts)) AS sess_len " +
        "FROM s GROUP BY user_id, sess_id) " +
        "SELECT user_id, COUNT(*) AS session_count, ROUND(AVG(sess_len), 2) AS avg_session_sec " +
        "FROM g GROUP BY user_id ORDER BY user_id")),

    QueryDef("q71_purchase_attribution",
      // Batch twin of the stream-stream interval join
      // (EventPipelines.purchaseAttribution): every purchase left-outer
      // joined to the same user's signups within the preceding 24 h —
      // unmatched purchases survive with a NULL signup, the shape
      // Structured Streaming finalizes once both watermarks pass the
      // interval. The join is an EQUI-join on user_id with a residual
      // time-range predicate, so at 100 TB it shuffles both sides once
      // on the join key (never a BNLJ); in streaming mode the watermark
      // bounds each side's state to the 24 h horizon. Equivalence of
      // this batch form with the watermarked streaming twin (inner and
      // left-outer) is pinned in EventPipelinesSpec. NULL sort order
      // differs between engines (Spark nulls-first, DuckDB nulls-last),
      // so the tiebreaker sorts on coalesce(signup_id, -1) on BOTH sides.
      (s, d) => {
        val ev = Tables(s, d, "events")
        val p = ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
        val sg = ev.where(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
        p.join(sg,
            col("user_id") === col("s_user") &&
              col("s_ts") <= col("p_ts") &&
              col("s_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"),
            "left")
          .select(col("purchase_id"), col("user_id"), col("signup_id"),
            round(col("p_ts").cast("double") - col("s_ts").cast("double"), 2).as("sec_since_signup"))
          .orderBy(col("purchase_id"), coalesce(col("signup_id"), lit(-1L)))
      },
      Some("WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events " +
        "WHERE event_type = 'purchase'), " +
        "s AS (SELECT event_id AS signup_id, user_id AS s_user, ts AS s_ts FROM events " +
        "WHERE event_type = 'signup') " +
        "SELECT purchase_id, user_id, signup_id, " +
        "ROUND(epoch(p_ts) - epoch(s_ts), 2) AS sec_since_signup " +
        "FROM p LEFT JOIN s ON user_id = s_user AND s_ts <= p_ts " +
        "AND s_ts >= p_ts - INTERVAL 24 HOURS " +
        "ORDER BY purchase_id, COALESCE(signup_id, -1)")),

    QueryDef("q71b_attribution_audit",
      // FULL-outer form of q71 — the attribution AUDIT: one relation
      // holding matched (purchase, signup) pairs, purchases nothing
      // attributed (NULL signup), and signups that converted nothing
      // within their 24 h window (NULL purchase). Same equi-join on
      // user_id + residual range, so the scale shape is identical to
      // q71; Structured Streaming supports the full-outer variant with
      // the same two-sided watermark state bound (twin pinned in
      // EventPipelinesSpec). Both NULLABLE key columns ride through
      // coalesce(-1) tiebreakers so the total order is engine-portable.
      (s, d) => {
        val ev = Tables(s, d, "events")
        val p = ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
        val sg = ev.where(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("s_ts"))
        p.join(sg,
            col("user_id") === col("s_user") &&
              col("s_ts") <= col("p_ts") &&
              col("s_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"),
            "full")
          .select(col("purchase_id"),
            coalesce(col("user_id"), col("s_user")).as("uid"),
            col("signup_id"),
            round(col("p_ts").cast("double") - col("s_ts").cast("double"), 2).as("sec_since_signup"))
          .withColumnRenamed("uid", "user_id")
          .orderBy(coalesce(col("purchase_id"), lit(-1L)), coalesce(col("signup_id"), lit(-1L)))
      },
      Some("WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events " +
        "WHERE event_type = 'purchase'), " +
        "s AS (SELECT event_id AS signup_id, user_id AS s_user, ts AS s_ts FROM events " +
        "WHERE event_type = 'signup') " +
        "SELECT purchase_id, COALESCE(user_id, s_user) AS user_id, signup_id, " +
        "ROUND(epoch(p_ts) - epoch(s_ts), 2) AS sec_since_signup " +
        "FROM p FULL JOIN s ON user_id = s_user AND s_ts <= p_ts " +
        "AND s_ts >= p_ts - INTERVAL 24 HOURS " +
        "ORDER BY COALESCE(purchase_id, -1), COALESCE(signup_id, -1)")),

    QueryDef("q40_dedup_earliest",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables(s, d, "events")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      },
      Some("SELECT COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value FROM (" +
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type " +
        "ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1")),

    QueryDef("q93_gap_fill",
      // Time-series resample + forward fill — the feature-pipeline
      // standard for turning an irregular event stream into a regular
      // grid (every ML feature store and monitoring system runs this
      // before any windowed model input). Per event type: the hourly
      // last-observed value (arg-max by event_id — deterministic, no
      // float ties), a calendar spine from the type's first to last
      // observed hour (sequence + explode — calendar-bounded, never
      // corpus-sized), and gaps carry the last observation forward via
      // last(ignoreNulls) over an hour-ordered running frame. Values
      // are integer cents (floor(x·100 + 0.5)) so the fill chain is
      // hash-exact on both engines. Scale shape: ONE pass over events
      // (hour-cell agg with map-side partials), then everything
      // downstream — spine, join, fill window — operates on the
      // calendar-bounded cell relation, partitioned per series key, so
      // a series with a million-hour span costs its hours, not its
      // events; with millions of series (entity × metric) the window
      // parallelism scales with the key count.
      (s, d) => {
        val obs = Tables(s, d, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(expr("max_by(CAST(floor(value * 100 + 0.5) AS BIGINT), event_id)").as("cents"),
            count(lit(1)).as("n"))
        val spine = obs.groupBy(col("event_type"))
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(col("event_type"),
            explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(obs, Seq("event_type", "h"), "left")
          .select(col("event_type"),
            date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
            last(col("cents"), ignoreNulls = true).over(w).as("filled_cents"),
            when(col("n").isNull, 1L).otherwise(0L).as("is_gap"))
          .orderBy(col("event_type"), col("h"))
      },
      Some("WITH obs AS (SELECT event_type, date_trunc('hour', ts) AS h, " +
        "arg_max(CAST(floor(value * 100 + 0.5) AS BIGINT), event_id) AS cents, " +
        "COUNT(*) AS n FROM events GROUP BY 1, 2), " +
        "sp AS (SELECT event_type, UNNEST(generate_series(MIN(h), MAX(h), INTERVAL 1 HOUR)) AS h " +
        "FROM obs GROUP BY event_type), " +
        "j AS (SELECT sp.event_type, sp.h, o.cents, o.n FROM sp " +
        "LEFT JOIN obs o ON o.event_type = sp.event_type AND o.h = sp.h) " +
        "SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS h, " +
        "last_value(cents IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h " +
        "ROWS UNBOUNDED PRECEDING) AS filled_cents, " +
        "CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap " +
        "FROM j ORDER BY event_type, h")))
}
