package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** q131: the context-length sweep's frontier follows from boundary
  * nesting (2048 = 4·512 = 16·128), so the monotonicity is a THEOREM
  * about the packer, not a fixture accident — pin it, plus the S=512
  * anchor against q74's own output. */
class PackingSweepSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("packs and straddles fall with S, tail waste rises; S=512 anchors to q74") {
    val rows = SparkEntry.queries("q131_packing_length_sweep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.map(_._1) == Seq(128L, 512L, 2048L))
    rows.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._2 <= a._2, s"n_packs rose with larger S: $a -> $b")
        assert(b._3 <= a._3, s"n_straddle rose with larger S (boundaries nest!): $a -> $b")
        assert(b._4 >= a._4, s"tail_waste fell with larger S: $a -> $b")
      case _ => ()
    }
    // S=512 must agree with q74's per-(shard, pack) output exactly:
    // same straddle total, same pack count, same token conservation
    val q74 = SparkEntry.queries("q74_sequence_packing")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val r512 = rows.find(_._1 == 512L).get
    assert(r512._3 == q74.map(_._4).sum, s"straddle total diverges from q74")
    val q74packs = q74.groupBy(_._1).map { case (_, xs) =>
      val tokens = xs.map(_._3).sum
      (tokens + 511) / 512
    }.sum
    assert(r512._2 == q74packs, s"pack count diverges from q74: ${r512._2} vs $q74packs")
  }
}
