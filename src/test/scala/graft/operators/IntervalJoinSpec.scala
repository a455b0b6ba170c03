package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketized point-in-interval join: equivalence with the naive range
  * join on adversarial boundaries, and the no-BNLJ plan property that
  * is the operator's reason to exist. */
class IntervalJoinSpec extends AnyFunSuite with SparkTestSession {

  private def tsDf(rows: Seq[(Long, String)], cols: (String, String)) = {
    import spark.implicits._
    rows.toDF(cols._1, "s").select(col(cols._1), col("s").cast("timestamp").as(cols._2))
  }

  test("equals the naive range join, including exact-boundary points") {
    // points sit ON bucket edges and interval endpoints; intervals span
    // 0, 1, and several buckets (width 60 s)
    val points = tsDf(Seq(
      (1L, "2026-01-01 00:00:00"), (2L, "2026-01-01 00:00:59"),
      (3L, "2026-01-01 00:01:00"), (4L, "2026-01-01 00:02:30"),
      (5L, "2026-01-01 00:05:00"), (6L, "2026-01-01 00:10:00")),
      ("pid", "ts"))
    val intervals = tsDf(Seq(
      (10L, "2026-01-01 00:00:00"), (11L, "2026-01-01 00:00:30"),
      (12L, "2026-01-01 00:04:00")), ("iid", "start"))
      .withColumn("end", col("start") + expr("INTERVAL 90 SECONDS"))
      .withColumn("end", when(col("iid") === 12L,
        col("start") + expr("INTERVAL 61 SECONDS")).otherwise(col("end")))

    val bucketed = IntervalJoin.pointInInterval(points, "ts", intervals, "start", "end", 60)
      .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .where(col("ts") >= col("start") && col("ts") <= col("end"))
      .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "fixture must produce matches")
    assert(bucketed == naive,
      s"missing=${naive -- bucketed} extra=${bucketed -- naive}")
  }

  test("equals the naive range join on randomized inputs and widths (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val points = (0 until 300).map(i => (i.toLong, rnd.nextInt(5000).toLong))
        .toDF("pid", "e").select(col("pid"), timestamp_seconds(col("e")).as("ts"))
      val intervals = (0 until 40).map { i =>
        val s = rnd.nextInt(5000).toLong
        (i.toLong, s, s + rnd.nextInt(400).toLong)
      }.toDF("iid", "s0", "e0").select(col("iid"),
        timestamp_seconds(col("s0")).as("start"), timestamp_seconds(col("e0")).as("end"))
      val width = Seq(30L, 97L, 600L)(trial)
      val bucketed = IntervalJoin.pointInInterval(points, "ts", intervals, "start", "end", width)
        .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = points.crossJoin(intervals)
        .where(col("ts") >= col("start") && col("ts") <= col("end"))
        .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(naive.nonEmpty, s"trial $trial degenerate")
      assert(bucketed == naive, s"trial $trial width=$width: " +
        s"missing=${(naive -- bucketed).take(3)} extra=${(bucketed -- naive).take(3)}")
    }
  }

  test("plans as a hash equi-join on the bucket, not a BNLJ") {
    import spark.implicits._
    val points = (0 until 1000).map(i => (i.toLong, i * 7L)).toDF("pid", "epoch")
      .select(col("pid"), timestamp_seconds(col("epoch")).as("ts"))
    val intervals = (0 until 20).map(i => (i.toLong, i * 300L)).toDF("iid", "s0")
      .select(col("iid"), timestamp_seconds(col("s0")).as("start"),
        timestamp_seconds(col("s0") + 600).as("end"))
    val plan = IntervalJoin.pointInInterval(points, "ts", intervals, "start", "end", 300)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }
}
