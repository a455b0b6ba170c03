package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral-analytics invariants beyond the DuckDB oracle gate: the
  * retention matrix's structural properties, and a full driver-side
  * differential replay of the funnel semantics on the sf0.001 fixture
  * (1000 events — small enough to recompute imperatively and compare).
  */
class BehavioralSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q80 offset-0 cells account for every user exactly once") {
    // every user is active in their own cohort week, so the offset-0
    // diagonal partitions the user base
    val rows = SparkEntry.queries("q80_retention_cohorts")(spark, dir).collect()
    val nUsers = Tables(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    val diag = rows.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    assert(diag == nUsers, s"offset-0 total $diag != distinct users $nUsers")
  }

  test("q80 no cell exceeds its cohort size, offsets are non-negative") {
    val rows = SparkEntry.queries("q80_retention_cohorts")(spark, dir).collect()
    val cohortSize = rows.filter(_.getAs[Long]("week_offset") == 0L)
      .map(r => r.getAs[String]("cohort_week") -> r.getAs[Long]("n_users")).toMap
    rows.foreach { r =>
      val cw = r.getAs[String]("cohort_week")
      assert(r.getAs[Long]("week_offset") >= 0L)
      assert(r.getAs[Long]("n_users") <= cohortSize(cw),
        s"cohort $cw offset ${r.getAs[Long]("week_offset")} retains more users than the cohort has")
    }
  }

  test("q82 funnel matches an imperative per-user replay") {
    // ground truth computed with plain Scala over the collected events:
    // first view, first click in (t1, t1+24h], first purchase in
    // (t2, t2+24h]
    val events = Tables(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val h24 = 24L * 3600 * 1000000L
    val byUser = events.groupBy(_._1)
    var nView = 0L; var nClick = 0L; var nPurchase = 0L
    byUser.foreach { case (_, evs) =>
      val t1 = evs.filter(_._3 == "view").map(_._2).minOption
      t1.foreach { v =>
        nView += 1
        val t2 = evs.filter(e => e._3 == "click" && e._2 > v && e._2 <= v + h24)
          .map(_._2).minOption
        t2.foreach { c =>
          nClick += 1
          val t3 = evs.filter(e => e._3 == "purchase" && e._2 > c && e._2 <= c + h24)
            .map(_._2).minOption
          t3.foreach(_ => nPurchase += 1)
        }
      }
    }
    val row = SparkEntry.queries("q82_funnel_conversion")(spark, dir).head()
    assert(row.getAs[Long]("n_view") == nView)
    assert(row.getAs[Long]("n_click_24h") == nClick)
    assert(row.getAs[Long]("n_purchase_24h") == nPurchase)
    assert(nView >= nClick && nClick >= nPurchase, "funnel must be monotone")
  }

  test("q84 WAU dominates DAU and matches a driver-side trailing-window replay") {
    val rows = SparkEntry.queries("q84_rolling_active_users")(spark, dir).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("dau_users"), r.getAs[Long]("wau_users")))
    assert(rows.nonEmpty)
    rows.foreach { case (day, dau, wau) =>
      assert(wau >= dau, s"$day: trailing-7-day actives $wau < same-day actives $dau")
    }
    // exact replay from collected (user, day) pairs; day strings are
    // rendered inside Spark (session UTC) so the replay never touches
    // the JVM default timezone
    val ud = Tables(spark, dir, "events")
      .select(col("user_id"), date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .distinct()
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val expected = ud.map(_._2).distinct.sortBy(_.toEpochDay).map { d =>
      val dau = ud.count(_._2 == d)
      val wau = ud.filter { case (_, ed) =>
        !ed.isAfter(d) && ed.isAfter(d.minusDays(7))
      }.map(_._1).distinct.length
      (d.toString, dau.toLong, wau.toLong)
    }
    val got = rows.map { case (day, dau, wau) => (day.take(10), dau, wau) }.toSeq
    assert(got == expected.toSeq, "rolling actives disagree with replay")
  }

  test("q92 matches an independent driver-side integer PageRank replay") {
    // rebuild the transition graph imperatively from the raw events and
    // fold the same integer recurrence 3 times — the engines' joins and
    // window never enter this path, so agreement checks the algorithm
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val edges = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).values.foreach { rows =>
      rows.sortBy(_._2).map(_._3).toSeq.sliding(2).foreach {
        case Seq(a, b) => edges((a, b)) = edges.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val nodes = ev.map(_._3).distinct.sorted
    val outW = edges.groupBy(_._1._1).map { case (s, es) => s -> es.values.sum }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case ((s, dst), w) =>
        contrib(dst) = contrib.getOrElse(dst, 0L) + (r(s) * w) / outW(s)
      }
      r = nodes.map(v => v -> (150000L + (17 * contrib.getOrElse(v, 0L)) / 20)).toMap
    }
    val got = SparkEntry.queries("q92_pagerank")(spark, dir).collect()
      .map(x => x.getString(0) -> x.getAs[Long]("rank_e6")).toMap
    assert(got == r, s"pagerank disagrees with replay:\n got $got\n exp $r")
    // structural sanity: every rank holds the teleport base, and total
    // mass never exceeds the initial N (floors and dangling only lose)
    assert(r.values.forall(_ >= 150000L))
    assert(got.values.sum <= nodes.length * 1000000L)
  }

  test("q93 grid is dense per type and fills match a driver-side replay") {
    val rows = SparkEntry.queries("q93_gap_fill")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("filled_cents"),
        r.getAs[Long]("is_gap")))
    // per type: consecutive hours, no duplicates, from first to last
    rows.groupBy(_._1).foreach { case (et, rs) =>
      val hours = rs.map(_._2).sorted
      assert(hours.distinct.length == hours.length, s"$et grid has duplicate hours")
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      val h0 = java.time.LocalDateTime.parse(hours.head, fmt)
      val h1 = java.time.LocalDateTime.parse(hours.last, fmt)
      assert(hours.length == java.time.Duration.between(h0, h1).toHours + 1,
        s"$et grid is not dense")
    }
    // replay: per (type, hour) the latest-by-event_id value of the
    // latest observed hour at or before it
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("h"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val lastPerHour = ev.groupBy(r => (r._1, r._3))
      .map { case (k, rs) => k -> rs.maxBy(_._2)._4 }
    rows.foreach { case (et, h, filled, isGap) =>
      assert(isGap == (if (lastPerHour.contains((et, h))) 0L else 1L),
        s"($et, $h) gap flag wrong")
      val expected = lastPerHour.filter { case ((t, oh), _) => t == et && oh <= h }
        .maxBy(_._1._2)._2
      assert(filled == expected, s"($et, $h): filled $filled, expected $expected")
    }
  }
}
