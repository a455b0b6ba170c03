package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q108's histogram quantile is not approximate in a fuzzy sense: the
  * first bin whose cumulative count reaches ceil(p·N/100) is EXACTLY
  * the bin containing the rank-ceil(p·N/100) element, so the reported
  * lower edge must equal floor(exact_quantile/1000)·1000 — the exact
  * quantile truncated to its bin. This pins the estimator's error to
  * the bin width by construction, not by measurement.
  */
class HistogramQuantileSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("histogram quantile equals the exact quantile's bin lower edge") {
    val hist = SparkEntry.queries("q108_histogram_quantiles")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val byType = Tables(spark, dir, "events")
      .select(col("event_type"), expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    assert(hist.keySet == byType.keySet)
    for ((t, sorted) <- byType; (p, pick) <- Seq(
        (50, (v: (Long, Long, Long)) => v._1),
        (95, (v: (Long, Long, Long)) => v._2),
        (99, (v: (Long, Long, Long)) => v._3))) {
      val n = sorted.length
      val exact = sorted((p * n + 99) / 100 - 1)
      val expected = exact / 1000 * 1000
      assert(pick(hist(t)) == expected,
        s"$t p$p: histogram ${pick(hist(t))} != bin(${exact}) = $expected")
    }
  }
}
