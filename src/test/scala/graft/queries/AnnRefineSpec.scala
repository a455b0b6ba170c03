package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q136 IVFPQ + exact re-rank (FAISS IndexRefineFlat): the refine
  * stage must be a pure function of the ADC score relation and the
  * full-precision vectors — pinned by a complete driver-side replay —
  * and must actually REPAIR quantization inversions on the fixture
  * (otherwise the entry is a relabeled q90). */
class AnnRefineSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private val R = 10

  /** Quantized components exactly as KMeansLloyd.quantize emits them. */
  private def xiOf(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000000 + 0.5).toLong).toArray

  private lazy val xi = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding")).collect()
    .map(r => r.getLong(0) -> xiOf(r.getSeq[Float](1))).toMap

  test("q136 equals a driver-side shortlist + exact re-rank replay; the re-rank is load-bearing") {
    refineReplay("q136_ivfpq_refine", Vectors.ivfpqAdcScored(spark, dir))
  }

  test("q137 (residual chain) equals the same replay over q96's scores") {
    refineReplay("q137_ivfpqr_refine", Vectors.ivfpqResAdcScored(spark, dir))
  }

  private def refineReplay(entry: String,
      scoredDf: org.apache.spark.sql.DataFrame): Unit = {
    val adc = scoredDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def exact(q: Long, n: Long): Long =
      xi(q).zip(xi(n)).map { case (a, b) => (a - b) * (a - b) }.sum

    val byQuery = adc.groupBy(_._1)
    val expect = byQuery.toSeq.flatMap { case (q, rows) =>
      val shortlist = rows.map { case (_, v, ad) => (ad, v) }
        .sorted.take(R).map(_._2)
      val reranked = shortlist.map(v => (exact(q, v), v)).sorted.take(3)
      reranked.zipWithIndex.map { case ((ed, v), i) => (q, i + 1L, v, ed) }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries(entry)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect, "refine output diverges from the driver replay")

    // load-bearing: for some query the exact order disagrees with the
    // ADC order inside the shortlist (a PQ quantization inversion the
    // refine stage repairs)
    val inverted = byQuery.exists { case (q, rows) =>
      val byAdc = rows.map { case (_, v, ad) => (ad, v) }.sorted.take(3).map(_._2)
      val byExact = rows.map { case (_, v, ad) => (ad, v) }
        .sorted.take(R).map(_._2).map(v => (exact(q, v), v)).sorted.take(3).map(_._2)
      byAdc != byExact
    }
    assert(inverted, s"$entry: fixture shows no ADC inversion - the refine stage is vacuous here")

    // never-worse guarantee on the exact metric: refine's top-1 exact
    // distance <= the exact distance of ADC's own top-1 (the ADC top-1
    // is always in the shortlist)
    for ((q, rows) <- byQuery) {
      val adcTop1 = rows.map { case (_, v, ad) => (ad, v) }.sorted.head._2
      val refineTop1 = expect.filter(t => t._1 == q && t._2 == 1L).head._3
      assert(exact(q, refineTop1) <= exact(q, adcTop1),
        s"query $q: refine top-1 worse than ADC top-1 on the exact metric")
    }
  }
}
