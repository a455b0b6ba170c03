package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q87's decimal(38,0) arithmetic is load-bearing, not defensive: this
  * spec drives the z-test core with hour-cell counts in the ~3e9–6e9
  * range (the 100 TB regime the entry's Scaladoc cites), where the
  * test's true comparands — dev² ≈ 1.4e20 and 4(n·Σc²−T²) ≈ 4e19 —
  * exceed 2^63. Subtraction makes wrapping int64 a ring homomorphism,
  * so the INTERMEDIATE wraps (Σc² ≈ 8e19) cancel; it is exactly these
  * final magnitudes that corrupt plain-long arithmetic, and on the
  * fixture below they don't merely perturb the verdicts — they invert
  * every one of them. (On the DuckDB side plain BIGINT wouldn't even
  * run: DuckDB errors on overflow, so HUGEINT is equally load-bearing
  * for the oracle.)
  */
class RateAnomalySpec extends AnyFunSuite with SparkTestSession {

  // 6 cells tightly around 3e9 + one 2× outlier: the outlier is the
  // single |z| > 2 anomaly under exact arithmetic
  private val counts = Seq(2999998258L, 2999998550L, 3000000331L,
    3000001128L, 3000001286L, 3000001471L, 6000000000L)

  private def exactVerdicts(cs: Seq[Long]): Seq[Boolean] = {
    val n = BigInt(cs.size)
    val t = cs.map(BigInt(_)).sum
    val s2 = cs.map(c => BigInt(c) * BigInt(c)).sum
    cs.map { c =>
      val dev = n * BigInt(c) - t
      dev * dev > 4 * (n * s2 - t * t)
    }
  }

  private def wrappedVerdicts(cs: Seq[Long]): Seq[Boolean] = {
    val n = cs.size.toLong
    val t = cs.foldLeft(0L)(_ + _)
    val s2 = cs.foldLeft(0L)((a, c) => a + c * c)
    cs.map { c =>
      val dev = n * c - t
      dev * dev > 4L * (n * s2 - t * t)
    }
  }

  test("decimal z-test stays exact past 2^63 where int64 inverts every verdict") {
    val exact = exactVerdicts(counts)
    val wrapped = wrappedVerdicts(counts)
    // the fixture is chosen to make the wrap CONSEQUENTIAL: plain long
    // arithmetic flips all 7 verdicts (6 false→true, the true anomaly
    // true→false) — if these ever agree the fixture lost its point
    assert(exact.count(identity) == 1 && exact.last,
      s"fixture self-check: expected exactly the outlier anomalous, got $exact")
    assert(wrapped == exact.map(!_),
      s"fixture self-check: expected int64 wrap to invert all verdicts, got $wrapped vs $exact")

    import spark.implicits._
    val hc = counts.zipWithIndex
      .map { case (c, i) => ("big", java.sql.Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"), c) }
      .toDF("event_type", "h", "c")
    val row = Behavioral.rateAnomaly(hc).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[String]("event_type") == "big")
    assert(r.getAs[Long]("n_hours") == counts.size.toLong)
    assert(r.getAs[Long]("n_anomalies") == 1L,
      s"expected the exact-arithmetic verdict (1 anomaly), got ${r.getAs[Long]("n_anomalies")}")
    assert(r.getAs[Long]("max_hourly") == 6000000000L)
  }

  test("sane-magnitude cells classify identically through the same path") {
    import spark.implicits._
    val small = Seq(100L, 101L, 99L, 100L, 500L)
    val hc = small.zipWithIndex
      .map { case (c, i) => ("sm", java.sql.Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"), c) }
      .toDF("event_type", "h", "c")
    val r = Behavioral.rateAnomaly(hc).collect().head
    assert(r.getAs[Long]("n_anomalies") == exactVerdicts(small).count(identity).toLong)
  }
}
