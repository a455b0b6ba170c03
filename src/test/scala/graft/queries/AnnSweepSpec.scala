package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** q129: the ANN operating-point sweep must report a sane cost/recall
  * frontier — the properties a deployment decision would rest on. */
class AnnSweepSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("the sweep's frontier is monotone and anchored") {
    val rows = SparkEntry.queries("q129_ann_operating_sweep")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ivf = rows.filter(_._1 == "ivf").sortBy(_._2)
    val beam = rows.filter(_._1 == "beam").sortBy(_._2)
    assert(ivf.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L) && beam.map(_._2).toSeq == Seq(2L, 4L, 8L))

    // cost strictly grows with the knob; recall never decreases
    def monotone(xs: Seq[(String, Long, Long, Long)]): Unit = {
      xs.sliding(2).foreach { case Seq(a, b) =>
        assert(b._3 > a._3, s"cost not increasing: $a -> $b")
        assert(b._4 >= a._4, s"recall decreased: $a -> $b")
      }
    }
    monotone(ivf); monotone(beam)

    // nProbe = 4 of 4 cells IS brute force via cells: recall is exact
    // by construction, and its candidate count is (n-1) per query
    val n = graft.Tables(spark, dir, "embeddings").count()
    val full = ivf.last
    assert(full._4 == 15L, s"nProbe=4 must hit 15/15: $full")
    assert(full._3 == 5L * (n - 1), s"nProbe=4 must scan everything: $full")

    // the widest beam must reach the exact recall too (q114's pin)
    assert(beam.last._4 == 15L, s"beam=8 must hit 15/15: ${beam.last}")
    // and graph search must be cheaper than the equal-recall IVF point
    val cheapestExactIvf = ivf.filter(_._4 == 15L).map(_._3).min
    val cheapestExactBeam = beam.filter(_._4 == 15L).map(_._3).min
    assert(cheapestExactBeam < cheapestExactIvf,
      s"graph ANN should reach exact recall cheaper: beam=$cheapestExactBeam ivf=$cheapestExactIvf")
  }
}
