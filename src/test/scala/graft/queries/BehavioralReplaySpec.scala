package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side replays of the round-6 Behavioral entries
  * (the q92/q94 doctrine): recompute q107's PSI and q110's trend from
  * the RAW collected events with plain Scala arithmetic — a third
  * implementation besides the Spark plan and the DuckDB oracle, so a
  * shared misunderstanding between the two SQL engines can't hide.
  */
class BehavioralReplaySpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def rawEvents = Tables(spark, dir, "events")
    .select(col("event_type"), col("value"), col("ts"))
    .collect().map(r => (r.getString(0), r.getDouble(1), r.getTimestamp(2)))

  test("q107 PSI replays exactly from raw events") {
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val grids = rawEvents.groupBy(_._1).map { case (ty, es) =>
      val n1 = Array.fill(10)(0L)
      val n2 = Array.fill(10)(0L)
      es.foreach { case (_, v, ts) =>
        val bin = math.max(0L, math.min(math.floor(v / 50).toLong, 9L)).toInt
        if (ts.before(cut)) n1(bin) += 1L else n2(bin) += 1L
      }
      val t1 = n1.sum + 10
      val t2 = n2.sum + 10
      val psi = (0 until 10).map { b =>
        val p = (n1(b) + 1) * 1000000L / t1
        val q = (n2(b) + 1) * 1000000L / t2
        (p - q) * math.floor(math.log(p.toDouble / q.toDouble) * 10000 + 0.5).toLong
      }.sum
      ty -> psi
    }
    val got = SparkEntry.queries("q107_distribution_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == grids, s"PSI replay mismatch: got=$got expect=$grids")
  }

  test("q110 trend replays exactly from raw events") {
    val origin = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val expect = rawEvents.groupBy(_._1).map { case (ty, es) =>
      var (n, sx, sy, sxy, sxx) = (0L, 0L, 0L, 0L, 0L)
      es.foreach { case (_, v, ts) =>
        val y = math.floor(v * 100 + 0.5).toLong
        val x = (ts.getTime - origin) / 1000 / 3600
        n += 1; sx += x; sy += y; sxy += x * y; sxx += x * x
      }
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val dirn = if (num * 100 > den) "up" else if (num * 100 < -den) "down" else "flat"
      ty -> ((n, num, den, dirn))
    }
    val got = SparkEntry.queries("q110_trend_regression")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got == expect, s"trend replay mismatch: got=$got expect=$expect")
  }
}
