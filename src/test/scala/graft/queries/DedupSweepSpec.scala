package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** q130: the dedup-policy sweep must be internally consistent and
  * anchored to the proven single-threshold machinery. */
class DedupSweepSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("tightening the threshold shrinks pairs, members and drops monotonically") {
    val rows = SparkEntry.queries("q130_dedup_threshold_sweep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(rows.map(_._1) == Seq(35L, 50L, 70L))
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 <= a._2, s"pairs grew with a stricter threshold: $a -> $b")
      assert(b._4 <= a._4, s"members grew with a stricter threshold: $a -> $b")
      assert(b._5 <= a._5, s"drops grew with a stricter threshold: $a -> $b")
    }
    rows.foreach { r =>
      assert(r._5 == r._4 - r._3, s"n_dropped must be members - clusters: $r")
      assert(r._3 <= r._4, s"more clusters than members: $r")
    }
    // anchor every row's pair count to the q54 pair relation directly
    // (the sf0.001 near-dups are all ≥ 0.7 jaccard, so the three legs
    // may legitimately coincide here — the anchor holds either way)
    val js = SparkEntry.queries("q54_banded_neardup")(spark, dir)
      .collect().map(_.getDouble(2)).toSeq
    rows.foreach { r =>
      val expect = js.count(_ >= r._1 / 100.0).toLong
      assert(r._2 == expect, s"pair count at t=${r._1} diverges from q54: ${r._2} vs $expect")
    }
  }

  test("the t=0.35 row is exactly q57's component structure") {
    val row35 = SparkEntry.queries("q130_dedup_threshold_sweep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).head
    val q57 = SparkEntry.queries("q57_dedup_groups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(row35._2 == q57.length.toLong, s"cluster count diverges from q57: $row35 vs ${q57.length}")
    assert(row35._3 == q57.map(_._2).sum, s"member count diverges from q57: $row35")
  }
}
