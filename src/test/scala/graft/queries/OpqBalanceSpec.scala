package graft.queries

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q116 OPQ-P: a plain-Scala replay of the WHOLE permuted-PQ pipeline
  * (variance keys, round-robin deal, seeds, one Lloyd update, argmin
  * distortion) must reproduce the engine's per-subspace distortion
  * exactly — and the balancing must do real work: the max/min
  * subspace-variance ratio collapses versus contiguous slicing, and
  * total distortion must not regress. */
class OpqBalanceSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private val M = 16
  private val SubDim = 4
  private val Ksub = 32

  test("q116 replays exactly; balanced allocation evens variance without costing distortion") {
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000000 + 0.5).toLong).toArray)
      .sortBy(_._1)
    val dim = vecs.head._2.length
    val n = vecs.length.toLong

    val vk: Array[Long] = (0 until dim).map { dd =>
      val xs = vecs.map(_._2(dd))
      n * xs.map(x => x * x).sum - { val s = xs.sum; s * s }
    }.toArray

    // a layout maps slot (sub, sd) -> original dimension
    def train(layout: (Int, Int) => Int): Array[Long] = {
      val sliced = vecs.map { case (id, x) =>
        id -> Array.tabulate(M, SubDim)((sub, sd) => x(layout(sub, sd)))
      }
      val seeds = sliced.filter(_._1 < Ksub).sortBy(_._1).map(_._2)
      (0 until M).map { sub =>
        val c0 = seeds.map(_(sub)) // Ksub codewords, assign-time round 1
        def nearest(cents: Seq[Array[Long]], x: Array[Long]): (Int, Long) =
          cents.zipWithIndex.map { case (c, i) =>
            (c.zip(x).map { case (a, b) => (a - b) * (a - b) }.sum, i)
          }.minBy { case (dist, i) => (dist, i) } match { case (d, i) => (i, d) }
        val assign1 = sliced.map { case (_, sx) => nearest(c0.toSeq, sx(sub))._1 }
        val c1 = assign1.zip(sliced).groupBy(_._1).toSeq.sortBy(_._1).map { case (cell, rs) =>
          val members = rs.map(_._2._2(sub))
          cell -> Array.tabulate(SubDim)(sd =>
            math.floor(members.map(_(sd)).sum.toDouble / members.size + 0.5).toLong)
        }
        val cents1 = c1.map(_._2)
        sliced.map { case (_, sx) => nearest(cents1, sx(sub))._2 }.sum
      }.toArray
    }

    // balanced: rank dims by (vk desc, dd), deal round-robin
    val ranked = (0 until dim).sortBy(dd => (-vk(dd), dd))
    val balancedAt = Array.tabulate(M, SubDim)((sub, sd) => ranked(sd * M + sub))
    def balanced(sub: Int, sd: Int): Int = balancedAt(sub)(sd)
    def contiguous(sub: Int, sd: Int): Int = sub * SubDim + sd

    val balDist = train(balanced)
    val conDist = train(contiguous)

    // engine output must equal the replay bit-for-bit
    val got = SparkEntry.queries("q116_opq_balanced_pq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val expectDims = (0 until M).map(sub =>
      (0 until SubDim).map(sd => balancedAt(sub)(sd)).mkString(","))
    assert(got.map(_._2).toSeq == expectDims, "dealt dimensions differ from replay")
    assert(got.map(_._3).toSeq == balDist.toSeq,
      s"distortion differs: engine=${got.map(_._3).toSeq} replay=${balDist.toSeq}")

    // variance balance: the deal must collapse the max/min subspace
    // variance ratio vs contiguous slicing
    def subVar(layout: (Int, Int) => Int): Seq[Long] =
      (0 until M).map(sub => (0 until SubDim).map(sd => vk(layout(sub, sd))).sum)
    val conVar = subVar(contiguous)
    val balVar = subVar(balanced)
    val conRatio = conVar.max.toDouble / conVar.min
    val balRatio = balVar.max.toDouble / balVar.min
    info(f"subspace var max/min: contiguous=$conRatio%.2f balanced=$balRatio%.2f; " +
      f"distortion: contiguous=${conDist.sum} balanced=${balDist.sum} " +
      f"(${100.0 * (conDist.sum - balDist.sum) / conDist.sum}%.1f%% better)")
    assert(balRatio < conRatio, s"deal did not even out variance: $conRatio -> $balRatio")
    assert(balDist.sum <= conDist.sum,
      s"balanced layout cost distortion: ${conDist.sum} -> ${balDist.sum}")
  }
}
