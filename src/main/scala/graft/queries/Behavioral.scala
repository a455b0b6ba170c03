package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-behavior analytics over the `events` stream: cohort retention
  * and ordered conversion funnels — the two queries every product
  * analytics engine runs and the reference's consumers would build on
  * top of its raw CDC event feed (the reference delivers events,
  * `gomaxscale.go:163-189`; it has no aggregation surface, SURVEY.md
  * §2B). Both are oracle-checked like the rest of §2C/D.
  *
  * Scale shape: everything here is keyed on `user_id` — ONE shuffle
  * brings a user's history together, and every later stage (cohort
  * join, funnel stage joins) reuses that partitioning, so Spark plans
  * them shuffle-free after the first exchange. The final aggregates are
  * tiny (weeks × offsets, or 3 stages).
  */
object Behavioral {

  private val Fmt = "yyyy-MM-dd HH:mm:ss"

  private def events(s: SparkSession, d: String): DataFrame = Tables(s, d, "events")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q80_retention_cohorts",
      // Weekly cohort retention: a user's cohort is the ISO week of
      // their first event; each (cohort, week-offset) cell counts users
      // active that many weeks later. Spark and DuckDB both truncate
      // weeks to Monday, and offsets are exact day-multiples of 7, so
      // the division is exact. The (user, week) distinct runs BEFORE
      // the cohort join, shrinking the join input from events to
      // user-weeks; cohort and activity share the user_id partitioning.
      (s, d) => {
        val uw = events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
          .distinct()
        val cohort = uw.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
        uw.join(cohort, Seq("user_id"))
          .groupBy(col("cw"), (datediff(col("w"), col("cw")) / 7).cast("long").as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .select(date_format(col("cw"), Fmt).as("cohort_week"), col("week_offset"),
            col("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events), " +
        "cohort AS (SELECT user_id, MIN(w) AS cw FROM uw GROUP BY 1) " +
        "SELECT strftime(cw, '%Y-%m-%d %H:%M:%S') AS cohort_week, " +
        "CAST(date_diff('day', cw, w) / 7 AS BIGINT) AS week_offset, " +
        "COUNT(*) AS n_users " +
        "FROM uw JOIN cohort USING (user_id) " +
        "GROUP BY cw, week_offset ORDER BY cohort_week, week_offset")),

    QueryDef("q82_funnel_conversion",
      // Ordered 3-step funnel view -> click -> purchase with a 24 h
      // conversion window per hop: a user counts toward a stage only if
      // it happened STRICTLY AFTER their entry into the previous stage
      // and within 24 h of it (first qualifying timestamp each; at the
      // fixtures this yields real decay, 150 -> 60 -> 25 at sf0.01).
      // Window arithmetic is integer-µs timestamp addition — exact on
      // both engines. Three min-aggregates chained by the range
      // predicate, all keyed on user_id — after the first exchange the
      // chain is co-partitioned; the output is one row of funnel counts.
      (s, d) => {
        val e = events(s, d).select(col("user_id"), col("ts"), col("event_type"))
        val t1 = e.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val t2 = e.where(col("event_type") === "click").join(t1, Seq("user_id"))
          .where(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val t3 = e.where(col("event_type") === "purchase").join(t2, Seq("user_id"))
          .where(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        t1.join(t2, Seq("user_id"), "left_outer").join(t3, Seq("user_id"), "left_outer")
          .agg(count(col("t1")).as("n_view"),
            count(col("t2")).as("n_click_24h"),
            count(col("t3")).as("n_purchase_24h"))
      },
      Some("WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e " +
        "JOIN t1 ON t1.user_id = e.user_id " +
        "WHERE e.event_type = 'click' AND e.ts > t1.t1 " +
        "AND e.ts <= t1.t1 + INTERVAL 24 HOUR GROUP BY 1), " +
        "t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e " +
        "JOIN t2 ON t2.user_id = e.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts > t2.t2 " +
        "AND e.ts <= t2.t2 + INTERVAL 24 HOUR GROUP BY 1) " +
        "SELECT COUNT(t1.t1) AS n_view, COUNT(t2.t2) AS n_click_24h, " +
        "COUNT(t3.t3) AS n_purchase_24h " +
        "FROM t1 LEFT JOIN t2 ON t2.user_id = t1.user_id " +
        "LEFT JOIN t3 ON t3.user_id = t1.user_id")),

    QueryDef("q84_rolling_active_users",
      // Rolling engagement: per calendar day, distinct active users
      // that day (DAU) and over the trailing 7 days (WAU). The
      // (user, day) DISTINCT collapses the event stream FIRST — at
      // 100 TB that single shuffle shrinks events to user-days — and
      // the trailing window is the IntervalJoin bucketize doctrine
      // (q10b): each user-day EXPLODES into the exactly-7 window days
      // it covers (day..day+6) and the count is a hash aggregation on
      // the window day. A non-equi `datediff BETWEEN` join against a
      // day dimension would force a BroadcastNestedLoopJoin — every
      // user-day tested against EVERY calendar day — whereas the
      // explode is a flat 7× map with no join at all; window days with
      // no events of their own drop out at the inner join with `dau`
      // (exactly the days the old day-dimension join admitted). Day
      // truncation and the 0..6-day offsets are integer-exact on both
      // engines.
      (s, d) => {
        val ud = events(s, d)
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .distinct()
        val dau = ud.groupBy(col("day").as("d")).agg(count(lit(1)).as("dau_users"))
        val wau = ud
          .select(col("user_id"), explode(sequence(col("day"),
            col("day") + expr("INTERVAL 6 DAYS"), expr("INTERVAL 1 DAY"))).as("d"))
          .groupBy(col("d")).agg(countDistinct(col("user_id")).as("wau_users"))
        dau.join(wau, Seq("d"))
          .select(date_format(col("d"), Fmt).as("day"), col("dau_users"), col("wau_users"))
          .orderBy(col("day"))
      },
      Some("WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events), " +
        "days AS (SELECT DISTINCT day AS d FROM ud), " +
        "dau AS (SELECT day AS d, COUNT(*) AS dau_users FROM ud GROUP BY 1), " +
        "wau AS (SELECT d, COUNT(DISTINCT user_id) AS wau_users FROM days " +
        "JOIN ud ON date_diff('day', ud.day, days.d) BETWEEN 0 AND 6 GROUP BY 1) " +
        "SELECT strftime(dau.d, '%Y-%m-%d %H:%M:%S') AS day, dau_users, wau_users " +
        "FROM dau JOIN wau USING (d) ORDER BY day")),

    QueryDef("q87_rate_anomaly",
      // Event-rate anomaly detection: an (event_type, hour) cell is
      // anomalous when its count deviates from that type's hourly mean
      // by more than 2 standard deviations. The z-test is done ENTIRELY
      // in integer arithmetic — (n·c − T)² > 4·(n·Σc² − T²) is the
      // |z| > 2 test multiplied through by n² — so no float, no sqrt,
      // no tolerance: bit-identical on both engines (the same
      // transcendental-avoidance doctrine as BM25's quantized idf).
      // The squared terms run in decimal(38,0) on the Spark side and
      // HUGEINT on DuckDB (plain BIGINT would wrap n·Σc² once hourly
      // counts × cell count pass ~1.5e9 — reachable in the 100 TB
      // regime; decimal38/int128 push the exactness bound to ~1e38,
      // i.e. n·C < ~1e19, unreachable). Only the tiny calendar-bounded
      // cell relation pays decimal arithmetic — the events-sized pass
      // is still pure long counting.
      // Scale shape: the only pass over events is the first hour-cell
      // agg (map-side partial); cells are calendar-bounded, the 5-row
      // per-type stats broadcast back onto them, and the verdict agg is
      // types-sized.
      (s, d) => rateAnomaly(
        events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("c"))),
      Some("WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c " +
        "FROM events GROUP BY 1, 2), " +
        "st AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n, SUM(c) AS t, " +
        "SUM(CAST(c AS HUGEINT) * c) AS s2 FROM hc GROUP BY 1), " +
        "fl AS (SELECT hc.event_type, " +
        "CASE WHEN (st.n*hc.c - st.t)*(st.n*hc.c - st.t) > 4*(st.n*st.s2 - st.t*st.t) " +
        "THEN 1 ELSE 0 END AS is_anomaly, hc.c " +
        "FROM hc JOIN st USING (event_type)) " +
        "SELECT event_type, COUNT(*) AS n_hours, CAST(SUM(is_anomaly) AS BIGINT) AS n_anomalies, " +
        "CAST(MAX(c) AS BIGINT) AS max_hourly FROM fl GROUP BY 1 ORDER BY 1"))) ++
    pagerank ++ drift ++ approxDistinct

  /** q92 in its own val so the iteration loop reads top-to-bottom. */
  private def pagerank: Seq[QueryDef] = Seq(
    QueryDef("q92_pagerank",
      // Weighted PageRank over the SESSION-TRANSITION graph — iterative
      // graph centrality, the one large-scale workload class (PageRank /
      // label propagation / power iteration) the engine didn't cover
      // beyond connected components (q57's large-star/small-star).
      // Nodes are event types, edges the user-consecutive transitions
      // (q59's ordering: per user by event_id), weighted by transition
      // count. PR with damping d = 0.85, 3 unrolled iterations, in the
      // integer doctrine end-to-end: ranks live in e-6 micro-units with
      // mass 1 per node (so the teleport base is the constant 150 000 —
      // no global N scalar needed anywhere), the per-edge contribution
      // is the exact integer (r·w) div W(src), and d multiplies as the
      // exact rational 17/20. Dangling-node mass is dropped (the
      // standard simplification; deterministic). Both engines fold
      // identically, so the 3-iteration fixpoint is oracle-hashable.
      // Scale shape: edge extraction is ONE window pass over events
      // (the user_id partitioning every Behavioral query reuses) and
      // the edge/out-weight relations — vocabulary-sized, not
      // corpus-sized — are what iterations touch. Each iteration is an
      // equi-join of edges with ranks on src (shuffle keyed on node id,
      // the partitioning every subsequent iteration reuses) plus a
      // dst-keyed agg; nothing ever collects to the driver, so the SAME
      // code runs when nodes are 1e9 URLs instead of 5 event types. At
      // production iteration counts (20+) each iteration's ranks would
      // checkpoint to storage instead of nesting lineage — 3 unrolled
      // iterations keep the whole thing one oracle-hashable plan.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d)
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val ed = ev.select(col("user_id"), col("event_id"), col("event_type").as("dst"))
          .withColumn("src", lag(col("dst"), 1).over(w))
          .where(col("src").isNotNull)
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        val ow = ed.groupBy(col("src")).agg(sum(col("w")).as("tw"))
        val nodes = ev.select(col("event_type").as("v")).distinct()
        var ranks = nodes.select(col("v"), lit(1000000L).as("r"))
        for (_ <- 1 to 3) {
          val contrib = ed.join(ow, "src")
            .join(ranks.withColumnRenamed("v", "src"), "src")
            .groupBy(col("dst")).agg(sum(expr("(r * w) div tw")).as("cs"))
          ranks = nodes.join(contrib.withColumnRenamed("dst", "v"), Seq("v"), "left")
            .select(col("v"), expr("150000L + (17 * coalesce(cs, 0L)) div 20").as("r"))
        }
        ranks.select(col("v").as("event_type"), col("r").as("rank_e6"))
          .orderBy(col("event_type"))
      },
      Some {
        def iter(prev: String, c: String, next: String) =
          s"$c AS (SELECT e.dst AS v, SUM(CAST((r.r * e.w) // o.tw AS BIGINT)) AS cs " +
            s"FROM ed e JOIN ow o USING (src) JOIN $prev r ON r.v = e.src GROUP BY 1), " +
            s"$next AS (SELECT nd.v, CAST(150000 + (17 * COALESCE(c.cs, 0)) // 20 AS BIGINT) AS r " +
            s"FROM nodes nd LEFT JOIN $c c USING (v)), "
        "WITH tr AS (SELECT user_id, event_type AS dst, LAG(event_type) OVER " +
          "(PARTITION BY user_id ORDER BY event_id) AS src FROM events), " +
          "ed AS (SELECT src, dst, COUNT(*) AS w FROM tr WHERE src IS NOT NULL GROUP BY 1, 2), " +
          "ow AS (SELECT src, SUM(w) AS tw FROM ed GROUP BY 1), " +
          "nodes AS (SELECT DISTINCT event_type AS v FROM events), " +
          "r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM nodes), " +
          iter("r0", "c1", "r1") + iter("r1", "c2", "r2") +
          iter("r2", "c3", "r3").stripSuffix(", ") +
          " SELECT v AS event_type, r AS rank_e6 FROM r3 ORDER BY event_type"
      }))

  /** q87's z-test core over an (event_type, h, c) hour-cell relation —
    * factored out so the overflow spec can feed SYNTHETIC counts past
    * the 64-bit wrap (RateAnomalySpec drives cells with c ~ 3e9, where
    * n·Σc² ≈ 6e19 > 2^63: plain BIGINT arithmetic would wrap and flip
    * verdicts; decimal(38,0) here and HUGEINT on the DuckDB side stay
    * exact to ~1e38). Everything after the one events-sized pass runs
    * on this calendar-bounded cell relation, so only it pays decimal
    * arithmetic. */
  private[graft] def rateAnomaly(hc: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val st = hc.groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("c")).cast(dec).as("t"),
        sum(col("c").cast(dec) * col("c").cast(dec)).as("s2"))
    val dev = col("n") * col("c").cast(dec) - col("t")
    hc.join(broadcast(st), Seq("event_type"))
      .withColumn("is_anomaly",
        when(dev * dev > lit(4L) * (col("n") * col("s2") - col("t") * col("t")), 1L)
          .otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("is_anomaly")).cast("long").as("n_anomalies"),
        max(col("c")).cast("long").as("max_hourly"))
      .orderBy(col("event_type"))
  }

  /** q107's deterministic binning — DataFrame-based so the SAME
    * expressions bin a streaming micro-batch (streaming/DriftMonitor,
    * the q107 running twin): fixed 50-unit value bins capped at 9,
    * h1 = 1 for the month's first half. */
  private[graft] def binnedDrift(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
      // clamped BOTH ends: an unclamped negative value would index
      // outside the streaming twin's state array (crash) while the
      // batch spine join silently dropped it — divergent AND fragile
      greatest(lit(0L), least(floor(col("value") / 50).cast("long"), lit(9L))).as("bin"),
      when(col("ts") < lit("2024-01-16").cast("timestamp"), 1L).otherwise(0L).as("h1"))

  /** q107's full PSI table from a binned relation (event_type, bin,
    * h1). The type spine derives from the binned relation itself —
    * identical to deriving from raw events, since binning drops no
    * rows. Shared with qc4 (the CDC-fed twin computes the same stage
    * over wire-accumulated state). */
  private[graft] def psiFromBinned(binned: DataFrame): DataFrame = {
    val cells = binned.groupBy(col("event_type"), col("bin"))
      .agg(sum(col("h1")).as("n1"), sum(lit(1L) - col("h1")).as("n2"))
    val spine = binned.select(col("event_type")).distinct()
      .select(col("event_type"), explode(expr("sequence(0L, 9L)")).as("bin"))
    val grid = spine.join(cells, Seq("event_type", "bin"), "left")
      .select(col("event_type"), col("bin"),
        coalesce(col("n1"), lit(0L)).as("n1"), coalesce(col("n2"), lit(0L)).as("n2"))
    val tot = grid.groupBy(col("event_type"))
      .agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    grid.join(tot, "event_type")
      .select(col("event_type"),
        expr("((n1 + 1) * 1000000L) div (t1 + 10)").as("p_e6"),
        expr("((n2 + 1) * 1000000L) div (t2 + 10)").as("q_e6"))
      .select(col("event_type"), ((col("p_e6") - col("q_e6")) *
        expr("CAST(floor(ln(CAST(p_e6 AS DOUBLE) / CAST(q_e6 AS DOUBLE)) * 10000 " +
          "+ CAST(0.5 AS DOUBLE)) AS BIGINT)")).as("contrib"))
      .groupBy(col("event_type")).agg(sum(col("contrib")).as("psi_e10"))
      .orderBy(col("event_type"))
  }

  /** q107's PSI fold from smoothed per-bin counts, shared with the
    * streaming twin so both sides quantize identically: e-6 integer
    * proportions, ln on the exact integer ratio quantized to 1e-4
    * nats, order-free integer sum. */
  private[graft] def psiE10(n1: IndexedSeq[Long], n2: IndexedSeq[Long]): Long = {
    val t1 = n1.sum + 10
    val t2 = n2.sum + 10
    (0 until 10).map { b =>
      val p = (n1(b) + 1) * 1000000L / t1
      val q = (n2(b) + 1) * 1000000L / t2
      (p - q) * math.floor(math.log(p.toDouble / q.toDouble) * 10000 + 0.5).toLong
    }.sum
  }

  /** q108's deterministic cent-bin — shared with the streaming
    * quantile twin (streaming/QuantileMonitor) like binnedDrift. */
  private[graft] def centsBinned(ev: DataFrame): DataFrame =
    ev.select(col("event_type"),
      expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 1000").as("bin"))

  /** q108's quantile rule from a bin→count histogram, shared with the
    * streaming twin: lower edge of the first bin whose cumulative
    * count reaches ceil(p·N/100). */
  private[graft] def histQuantiles(bins: collection.Map[Long, Long]): (Long, Long, Long) = {
    val n = bins.valuesIterator.sum
    def q(p: Long): Long = {
      val need = (p * n + 99) / 100
      var cum = 0L
      for ((b, c) <- bins.toSeq.sortBy(_._1)) {
        cum += c
        if (cum >= need) return b * 1000
      }
      Long.MinValue // unreachable for non-empty histograms
    }
    (q(50), q(95), q(99))
  }

  /** DuckDB oracle shared by q107 and qc4 (the CDC-fed twin): the
    * whole PSI computation from the raw `events` table — no CDC
    * anywhere, so the qc4 hash gate closes over the full wire path. */
  private[graft] val DriftPsiOracleSql: String =
    "WITH binned AS (SELECT event_type, " +
      "GREATEST(0, LEAST(CAST(FLOOR(value / 50) AS BIGINT), 9)) AS bin, " +
      "CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS h1 FROM events), " +
      "cells AS (SELECT event_type, bin, SUM(h1) AS n1, SUM(1 - h1) AS n2 " +
      "FROM binned GROUP BY 1, 2), " +
      "spine AS (SELECT event_type, b.bin FROM (SELECT DISTINCT event_type FROM events) ty " +
      "CROSS JOIN (SELECT UNNEST(range(0, 10)) AS bin) b), " +
      "grid AS (SELECT s.event_type, s.bin, COALESCE(c.n1, 0) AS n1, COALESCE(c.n2, 0) AS n2 " +
      "FROM spine s LEFT JOIN cells c ON c.event_type = s.event_type AND c.bin = s.bin), " +
      "tot AS (SELECT event_type, SUM(n1) AS t1, SUM(n2) AS t2 FROM grid GROUP BY 1), " +
      "pq AS (SELECT g.event_type, " +
      "CAST(((g.n1 + 1) * 1000000) // (t.t1 + 10) AS BIGINT) AS p_e6, " +
      "CAST(((g.n2 + 1) * 1000000) // (t.t2 + 10) AS BIGINT) AS q_e6 " +
      "FROM grid g JOIN tot t USING (event_type)) " +
      "SELECT event_type, CAST(SUM((p_e6 - q_e6) * " +
      "CAST(FLOOR(LN(CAST(p_e6 AS DOUBLE) / CAST(q_e6 AS DOUBLE)) * 10000 " +
      "+ CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS psi_e10 " +
      "FROM pq GROUP BY 1 ORDER BY 1"

  /** q107 in its own val: distribution-drift monitoring. */
  private def drift: Seq[QueryDef] = Seq(
    QueryDef("q107_distribution_drift",
      // Population Stability Index between the first and second half of
      // the month, per event type — THE drift monitor a production
      // training pipeline runs on every feature before retraining
      // (PSI = Σ (p_i − q_i)·ln(p_i/q_i) over fixed bins; > 0.25 is the
      // classic retrain trigger). Deterministic end-to-end by the
      // integer doctrine: fixed 50-unit value bins (never data-derived
      // quantiles — those drift with the data being monitored), Laplace
      // +1 smoothing over the FULL type×bin spine so empty bins are
      // exact, proportions as e-6 integer micro-units via integer
      // division, and the one transcendental evaluates on the exact
      // integer ratio p_e6/q_e6 then quantizes to 1e-4 nats (the
      // q67/q69/q97 doctrine), so each bin's contribution
      // (p_e6 − q_e6)·ln_e4 is an exact integer product and the sum is
      // order-free. Scale shape: ONE events scan → conditional
      // aggregation on (type, bin) — the shuffle is bins×types rows, a
      // few dozen regardless of corpus size; the spine cross join and
      // per-type totals are broadcast-sized. At 100 TB this runs per
      // feature column as a map-side-combined agg over the feature
      // scan; nothing grows with row count.
      (s, d) => psiFromBinned(binnedDrift(events(s, d))),
      Some(DriftPsiOracleSql)),

    QueryDef("q108_histogram_quantiles",
      // Mergeable fixed-bin histogram quantiles per event type — the
      // sketch-class answer to "p50/p95/p99 at 100 TB": exact
      // percentiles (q23b) need a per-group sort of the DATA, a
      // histogram needs one conditional agg to bins that MERGE across
      // shards/days/streams by simple addition, with error bounded by
      // the bin width (here 10 value units = 1000 cents, spec-pinned
      // against the exact quantile). Deterministic end-to-end: integer
      // cents, fixed bin edges (bin = cents div 1000 — never
      // data-derived), quantile = the lower edge of the first bin whose
      // cumulative count reaches ceil(p·N/100) (integer ceil, exact in
      // both engines). Scale shape: the scan aggregates to ≤ ~50 bins
      // per type map-side; the cumulative walk is a window over BINS
      // (dozens of rows), not data — the same bounded-final-pass shape
      // as q105's global frontier. At production this is the histogram
      // a metrics pipeline keeps per (feature, day) and merges on
      // demand for any time range — recomputing nothing.
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hist = centsBinned(events(s, d))
          .groupBy(col("event_type"), col("bin")).agg(count(lit(1)).as("c"))
        val wcum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wtot = Window.partitionBy(col("event_type"))
        val cum = hist.select(col("event_type"), col("bin"),
          sum(col("c")).over(wcum).as("cum"), sum(col("c")).over(wtot).as("n"))
        cum.groupBy(col("event_type")).agg(
          min(when(col("cum") >= expr("(50 * n + 99) div 100"), col("bin") * 1000)).as("p50_cents"),
          min(when(col("cum") >= expr("(95 * n + 99) div 100"), col("bin") * 1000)).as("p95_cents"),
          min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("bin") * 1000)).as("p99_cents"))
          .orderBy(col("event_type"))
      },
      Some("WITH hist AS (SELECT event_type, " +
        "CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 1000 AS BIGINT) AS bin, " +
        "COUNT(*) AS c FROM events GROUP BY 1, 2), " +
        "cum AS (SELECT event_type, bin, " +
        "SUM(c) OVER (PARTITION BY event_type ORDER BY bin " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "SUM(c) OVER (PARTITION BY event_type) AS n FROM hist) " +
        "SELECT event_type, " +
        "CAST(MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN bin * 1000 END) AS BIGINT) AS p50_cents, " +
        "CAST(MIN(CASE WHEN cum >= (95 * n + 99) // 100 THEN bin * 1000 END) AS BIGINT) AS p95_cents, " +
        "CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin * 1000 END) AS BIGINT) AS p99_cents " +
        "FROM cum GROUP BY 1 ORDER BY 1")),

    QueryDef("q110_trend_regression",
      // Grouped OLS trend per event type — is each metric drifting up
      // or down over the month? Closed-form least squares from one
      // conditional agg pass: slope = (n·Σxy − Σx·Σy)/(n·Σxx − Σx²)
      // with x = hours since month start (≤ 720) and y = integer cents.
      // DIVISION-FREE by the q87 doctrine: the exact rational slope
      // ships as (trend_num, trend_den) BIGINTs, and the direction
      // classifies by cross-multiplication (num·100 vs ±den ⇔
      // |slope| vs 0.01 cents/hour) — no float, no rounding rule to
      // disagree on, both engines compare the same integers. Overflow
      // bounds at these magnitudes: sxy ≤ 3.5e7/row, n·sxy ≤ 1.4e16,
      // sx·sy ≤ 1.4e16, num·100 ≤ 1.4e18 < 2^63 — exact through ~1e7
      // rows/type at hour-granularity x; beyond that (the 100 TB
      // regime) the num/den combination moves to decimal(38,0), the
      // q87 move. Scale shape: ONE events scan, map-side partial sums,
      // a types-row result — the same shape at any corpus size.
      (s, d) => {
        // ts >= origin filter: for NEGATIVE offsets Spark's `div`
        // (truncate toward zero) and DuckDB's date_diff (hour-boundary
        // crossings) disagree (−30 min → x=0 vs x=−1), and a
        // DST-shifting session TZ could skew the literal parse. The
        // trend window is the month starting at the origin, so
        // restricting to it is the semantics; fixtures are entirely
        // January-2024 (hash unchanged). Sessions run UTC (all graft
        // builders pin spark.sql.session.timeZone=UTC).
        val xy = events(s, d)
          .filter(col("ts") >= expr("TIMESTAMP '2024-01-01 00:00:00'"))
          .select(col("event_type"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("y"),
          expr("(unix_timestamp(ts) - unix_timestamp(TIMESTAMP '2024-01-01 00:00:00')) div 3600")
            .as("x"))
        xy.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("trend_num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("trend_den"))
          .select(col("event_type"), col("n"), col("trend_num"), col("trend_den"),
            when(col("trend_num") * 100 > col("trend_den"), "up")
              .when(col("trend_num") * 100 < -col("trend_den"), "down")
              .otherwise("flat").as("direction"))
          .orderBy(col("event_type"))
      },
      Some("WITH xy AS (SELECT event_type, " +
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y, " +
        "CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS x " +
        "FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'), " +
        "s AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, " +
        "SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM xy GROUP BY 1), " +
        "t AS (SELECT event_type, n, " +
        "CAST(n * sxy - sx * sy AS BIGINT) AS trend_num, " +
        "CAST(n * sxx - sx * sx AS BIGINT) AS trend_den FROM s) " +
        "SELECT event_type, n, trend_num, trend_den, " +
        "CASE WHEN trend_num * 100 > trend_den THEN 'up' " +
        "WHEN trend_num * 100 < -trend_den THEN 'down' " +
        "ELSE 'flat' END AS direction " +
        "FROM t ORDER BY event_type")))

  /** q111: the grouped mergeable approx-distinct pair. */
  private def approxDistinct: Seq[QueryDef] = Seq(
    QueryDef("q111_grouped_approx_distinct",
      // Grouped MERGEABLE approx-distinct — the monitoring primitive a
      // 100 TB pipeline runs hourly (distinct users per day × type):
      // graft.functions.HllDistinct folds user ids into a 4 KB HLL
      // register array per (group, task) map-side, so the shuffle
      // carries 4 KB per group per task — NEVER the ids — and exact
      // distinct's per-key state (the q14/q84 shape, fine at fixture
      // scale, deadly at 1e9 users/day) is gone. Registers merge by
      // elementwise max: idempotent, commutative, associative, so the
      // result is partition- and arrival-order-invariant, and per-day
      // sketches roll up to coarser windows WITHOUT rescanning.
      // No DuckDB oracle by nature (approximate — declared rows-only,
      // the q14b precedent); pinned the MisraGries way instead:
      // HllDistinctSpec replays the identical fold on the driver
      // bit-for-bit, proves partition invariance and day→whole-range
      // register merge-up, and bounds the error against the exact twin
      // q111b (which carries the hash-gate oracle).
      (s, d) => {
        val hll = udaf(new graft.functions.HllDistinct,
          org.apache.spark.sql.Encoders.scalaLong)
        events(s, d)
          .select(date_format(date_trunc("day", col("ts")), Fmt).as("day"),
            col("event_type"), col("user_id"))
          .groupBy(col("day"), col("event_type"))
          .agg(hll(col("user_id")).as("approx_users"))
          .orderBy(col("day"), col("event_type"))
      },
      None),
    QueryDef("q111b_grouped_exact_distinct",
      // q111's exact twin: the same grouping through countDistinct,
      // oracle-checked — the ground truth the sketch's error bound is
      // measured against (and the shape whose per-key state cost is
      // the reason q111 exists).
      (s, d) => events(s, d)
        .select(date_format(date_trunc("day", col("ts")), Fmt).as("day"),
          col("event_type"), col("user_id"))
        .groupBy(col("day"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("day"), col("event_type")),
      Some("SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day, " +
        "event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users " +
        "FROM events GROUP BY 1, 2 ORDER BY day, event_type")))
}
