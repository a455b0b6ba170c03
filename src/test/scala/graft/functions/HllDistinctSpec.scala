package graft.functions

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q111's sketch has no SQL oracle (approximate by nature), so it is
  * pinned the MisraGries way: the distributed result must equal a
  * bit-for-bit DRIVER REPLAY of the same fold (the sketch is
  * deterministic — fixed hash, no seed), the registers must be
  * invariant to partitioning (merge = elementwise max), per-day
  * registers must MERGE UP to the whole-range sketch without touching
  * the data again (the re-aggregation property that makes it a
  * monitoring primitive), and the estimate must sit inside its
  * theoretical error band against the exact twin q111b.
  */
class HllDistinctSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def groups(): Map[(String, String), Seq[Long]] =
    graft.Tables(spark, dir, "events")
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd HH:mm:ss").as("day"),
        col("event_type"), col("user_id"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSeq }

  private def driverEstimate(ids: Seq[Long]): Long =
    Hll.estimate(ids.foldLeft(new Array[Byte](Hll.M))(Hll.fold))

  test("distributed sketch equals the driver replay bit-for-bit") {
    val q = SparkEntry.queries("q111_grouped_approx_distinct")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val replay = groups().map { case (k, ids) => k -> driverEstimate(ids) }
    assert(q == replay)
  }

  test("result is invariant to input partitioning") {
    val hll = udaf(new HllDistinct, org.apache.spark.sql.Encoders.scalaLong)
    def run(parts: Int) = graft.Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id"))
      .repartition(parts, col("user_id") % 11)
      .groupBy(col("event_type")).agg(hll(col("user_id")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(3) == run(13))
  }

  test("per-day registers merge up to the whole-range sketch (no rescan)") {
    val byDayType = groups()
    val byType = byDayType.toSeq.groupBy(_._1._2)
    byType.foreach { case (tpe, dayGroups) =>
      // merge the per-day register arrays…
      val merged = dayGroups.map { case (_, ids) =>
        ids.foldLeft(new Array[Byte](Hll.M))(Hll.fold)
      }.reduce(Hll.merge)
      // …and compare against folding the union of the raw ids directly
      val direct = dayGroups.flatMap(_._2).foldLeft(new Array[Byte](Hll.M))(Hll.fold)
      assert(java.util.Arrays.equals(merged, direct), s"register drift for $tpe")
      assert(Hll.estimate(merged) == driverEstimate(dayGroups.flatMap(_._2)))
    }
  }

  test("estimate sits inside the error band of the exact twin") {
    val approx = SparkEntry.queries("q111_grouped_approx_distinct")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val exact = SparkEntry.queries("q111b_grouped_exact_distinct")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val e = approx(k)
      // 3σ of HLL's 1.04/√4096 ≈ 4.9%; fixture groups are in the
      // linear-counting regime where the estimate is near-exact, so
      // this bound has large headroom without being vacuous
      assert(math.abs(e - n) <= math.max(2L, (0.05 * n).toLong),
        s"$k: approx $e vs exact $n")
    }
  }

  test("error stays in band at cardinalities far beyond the register count") {
    // 1e6 distinct ids — deep in the HLL (non-linear-counting) regime;
    // deterministic hash, so this is a fixed number, pinned loosely at
    // the 3σ theoretical band rather than at its exact value
    val regs = new Array[Byte](Hll.M)
    var i = 0L
    while (i < 1000000L) { Hll.fold(regs, i * 2654435761L + 17L); i += 1 }
    val est = Hll.estimate(regs)
    assert(math.abs(est - 1000000L) <= 49000L, s"estimate $est for 1e6 distinct")
  }
}
