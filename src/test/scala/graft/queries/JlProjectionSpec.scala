package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** q132: the JL distortion audit must show the concentration the lemma
  * promises — mass near ratio 1.0 with Var ≈ 2/k — and account for
  * every consecutive pair exactly. */
class JlProjectionSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("distortion ratios concentrate around 1 and every pair is accounted for") {
    val rows = SparkEntry.queries("q132_jl_projection_audit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = Tables(spark, dir, "embeddings").count()
    val total = rows.map(_._2).sum
    assert(total == n - 1, s"pairs unaccounted: $total of ${n - 1}")
    // bucket b holds ratios in [0.2b, 0.2(b+1)); the lemma's
    // concentration at k=16 puts the bulk within ±40% of 1.0
    val near1 = rows.filter(r => r._1 >= 3 && r._1 <= 6).map(_._2).sum
    assert(near1 * 2 > total,
      s"no concentration: only $near1/$total pairs within [0.6, 1.4)")
    // buckets are internally consistent: min/max inside the bucket span
    rows.filter(_._1 < 20).foreach { case (b, _, mn, mx) =>
      assert(mn >= b * 2000 && mx < (b + 1) * 2000, s"bucket $b spans [$mn,$mx]")
    }
    // the unbiased normalizer is load-bearing: the bucket-midpoint
    // weighted mean ratio must sit near 1.0 (a wrong scale factor —
    // the bug this spec was written against — lands it at 64)
    val meanE4 = rows.map(r => (r._1 * 2000 + 1000) * r._2).sum.toDouble / total
    assert(meanE4 > 7000 && meanE4 < 13000, s"mean ratio off unit: ${meanE4 / 10000}")
  }
}
